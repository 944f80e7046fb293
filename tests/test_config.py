"""Typed layered config system (hevctpu/config.py): the
program_options_lite equivalent — cfg files parsed in order, CLI
overrides last, typed validation, fan-out to StreamConfig/FrameEncoder
(TAppEncCfg.cpp:731; program_options_lite.cpp:453,551)."""

import os

import numpy as np
import pytest

from hevctpu import cli, config
from hevctpu.pipeline import yuv

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODEC_CFG = os.path.join(ROOT, "configs", "encoder_intra_main.cfg")


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_defaults():
    ec = config.load()
    assert ec.qp == 32 and ec.rdoq and ec.sao and ec.deblock
    assert ec.search == "cnn" and ec.max_tu_depth_intra == 3


def test_shipped_codec_cfg_parses():
    ec = config.load([CODEC_CFG])
    assert ec.qp == 32 and ec.sign_data_hiding and ec.transform_skip


def test_layering_later_file_wins(tmp_path):
    a = _write(tmp_path, "a.cfg", "QP : 32\nSAO : 1\n")
    b = _write(tmp_path, "b.cfg", "QP : 27\n")
    ec = config.load([a, b])
    assert ec.qp == 27 and ec.sao


def test_cli_overrides_last(tmp_path):
    a = _write(tmp_path, "a.cfg", "QP : 32\n")
    ec = config.load([a], qp=22)
    assert ec.qp == 22
    # None overrides are "not given" and must not clobber cfg values
    ec = config.load([a], qp=None)
    assert ec.qp == 32


def test_sequence_cfg_fields(tmp_path):
    s = _write(tmp_path, "seq.cfg",
               "InputFile : clip.yuv\nSourceWidth : 416\n"
               "SourceHeight : 240\nFrameRate : 30\n"
               "FramesToBeEncoded : 6\nBitstreamFile : out.bin\n")
    ec = config.load([s])
    assert (ec.input_file, ec.source_width, ec.source_height,
            ec.frames_to_be_encoded) == ("clip.yuv", 416, 240, 6)
    assert ec.bitstream_file == "out.bin"


def test_unknown_option_rejected(tmp_path):
    bad = _write(tmp_path, "bad.cfg", "NoSuchOption : 1\n")
    with pytest.raises(config.ConfigError, match="unknown option"):
        config.load([bad])


def test_pinned_option_value_rejected(tmp_path):
    bad = _write(tmp_path, "bad.cfg", "MaxCUWidth : 32\n")
    with pytest.raises(config.ConfigError, match="unsupported"):
        config.load([bad])
    ok = _write(tmp_path, "ok.cfg", "MaxCUWidth : 64\n")
    config.load([ok])  # matching pinned value accepted


def test_bad_typed_value_rejected(tmp_path):
    bad = _write(tmp_path, "bad.cfg", "QP : notanumber\n")
    with pytest.raises(config.ConfigError, match="bad value"):
        config.load([bad])
    with pytest.raises(config.ConfigError):
        config.load([], qp=99)  # range validation
    with pytest.raises(config.ConfigError):
        config.load([], search="both")


def test_loopfilter_disable_inverts():
    import dataclasses
    ec = config.EncoderConfig(deblock=False, sao=False)
    sc = ec.to_stream_config()
    assert not sc.deblock and not sc.sao
    assert dataclasses.asdict(ec)["deblock"] is False


def test_fanout_matches_encoder_kwargs():
    ec = config.load([], source_width=64, source_height=64,
                     sign_data_hiding=False, transform_skip=False)
    kw = ec.encoder_kwargs()
    assert kw["sbh"] is False and kw["ts"] is False and kw["tu_split"]
    sc = ec.to_stream_config(qp=27)
    assert sc.qp == 27 and not sc.sign_data_hiding


def test_cli_two_file_layering_end_to_end(tmp_path, capsys):
    """The reference's two-file setup: codec cfg + sequence cfg
    (encoder_intra_main.cfg + bitstream.cfg)."""
    rng = np.random.default_rng(3)
    h = w = 64
    y = rng.integers(0, 255, (2, h, w)).astype(np.uint8)
    u = np.full((2, h // 2, w // 2), 128, np.uint8)
    v = np.full((2, h // 2, w // 2), 128, np.uint8)
    clip = str(tmp_path / "in.yuv")
    yuv.write_yuv420(clip, y, u, v)
    seq = _write(tmp_path, "seq.cfg",
                 f"InputFile : {clip}\nSourceWidth : {w}\n"
                 f"SourceHeight : {h}\nFramesToBeEncoded : 2\n"
                 f"BitstreamFile : {tmp_path}/out.bin\n"
                 "Search : rd\n")
    rc = cli.main(["encode", "-c", CODEC_CFG, "-c", seq, "-q", "37"])
    assert rc == 0
    assert os.path.getsize(str(tmp_path / "out.bin")) > 0
    out = capsys.readouterr().out
    assert "QP 37" in out  # CLI override beat both cfg files
