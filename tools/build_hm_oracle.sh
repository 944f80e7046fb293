#!/bin/bash
# Build the HM 16.20 reference encoder/decoder from the (read-only) reference
# checkout as an external conformance oracle + performance anchor.
#
# The copy is patched minimally for a portable Linux build:
#   * the CNN-pipeline subprocess launches are removed (encmain.cpp:105-108);
#   * the Windows-only pred-file polling (TEncCu.cpp:243-255, <io.h>/Sleep)
#     becomes access()/usleep() and is gated behind HM_USE_PRED=1;
#   * without HM_USE_PRED the depth gate (TEncCu.cpp:496-520) is neutralized
#     (sentinel 99 -> full search), i.e. the unmodified-HM anchor;
#   * -Werror dropped (HM 16.20 predates current gcc warnings).
#
# Usage: tools/build_hm_oracle.sh [BUILD_DIR]   (default /tmp/hm)
# Products: $BUILD_DIR/bin/TAppEncoderStatic, TAppDecoderStatic
# Tests pick the decoder up via $HM_DECODER or the default path below.
set -euo pipefail

SRC=${HM_REFERENCE_DIR:-/root/reference/HM_dl}
DST=${1:-/tmp/hm}

if [ -x "$DST/bin/TAppDecoderStatic" ] && [ -x "$DST/bin/TAppEncoderStatic" ]; then
    echo "oracle already built at $DST/bin"
    exit 0
fi

rm -rf "$DST"
cp -r "$SRC" "$DST"

python3 - "$DST" <<'EOF'
import sys

dst = sys.argv[1]

p = f"{dst}/source/App/TAppEncoder/encmain.cpp"
s = open(p).read()
s = s.replace(
    '  system("python gen_frames.py");\n  thread thread(py_pred);\n  thread.detach();\n',
    '  // (pipeline subprocess launches removed for the portable anchor build;\n'
    '  //  prediction files are consumed directly when HM_USE_PRED=1)\n')
open(p, "w").write(s)

p = f"{dst}/source/Lib/TLibEncoder/TEncCu.cpp"
s = open(p).read()
s = s.replace("#include <io.h>\n#include<Windows.h>\n",
              "#include <cstdlib>\n#include <unistd.h>\n")
old_poll = '''  string filename = "./pred/"+to_string(m_iFrame)+"/ctu"+ to_string(pCtu->getCtuRsAddr())+".txt";
  while (_access(filename.c_str(), 0) != 0) { Sleep(1); }
  ifstream depth_file(filename);
  UInt label[16];
  for (int i = 0; i < 16; i++) {
\t  depth_file >> label[i];
\t  //cout << label[i] << endl;
  }
  depth_file.close();
  m_ppcBestCU[0]->set_pred(label);'''
new_poll = '''  UInt label[16];
  if (getenv("HM_USE_PRED") != NULL) {
    string filename = "./pred/"+to_string(m_iFrame)+"/ctu"+ to_string(pCtu->getCtuRsAddr())+".txt";
    while (access(filename.c_str(), F_OK) != 0) { usleep(1000); }
    ifstream depth_file(filename);
    for (int i = 0; i < 16; i++) {
      depth_file >> label[i];
    }
    depth_file.close();
  } else {
    for (int i = 0; i < 16; i++) label[i] = 99;
  }
  m_ppcBestCU[0]->set_pred(label);'''
assert old_poll in s, "poll block not found"
s = s.replace(old_poll, new_poll)

old_gate = '''  if (pred_depth > uiDepth) {
\t  check_current = false;
\t  check_next = true;
  }
  else if (pred_depth == uiDepth) {
\t  check_current = true;
\t  check_next = false;
  }
  else {
\t  check_current = false;
\t  check_next = false;
  }'''
new_gate = '''  if (pred_depth == 99) {   // anchor mode: full unpruned search
\t  check_current = true;
\t  check_next = true;
  }
  else if (pred_depth > uiDepth) {
\t  check_current = false;
\t  check_next = true;
  }
  else if (pred_depth == uiDepth) {
\t  check_current = true;
\t  check_next = false;
  }
  else {
\t  check_current = false;
\t  check_next = false;
  }'''
assert old_gate in s, "gate block not found"
s = s.replace(old_gate, new_gate)
open(p, "w").write(s)
print("patched")
EOF

sed -i 's/ -Werror//g' "$DST/build/linux/common/makefile.base"

cd "$DST/build/linux"
for d in lib/TLibVideoIO lib/TLibCommon lib/TLibDecoder lib/TLibEncoder \
         lib/TAppCommon app/TAppDecoder app/TAppEncoder; do
    make -C $d MM32=0 -j"$(nproc)" release
done
echo "built: $DST/bin"
ls -la "$DST/bin"
