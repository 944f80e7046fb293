from hevctpu.cli import main
import sys

sys.exit(main())
