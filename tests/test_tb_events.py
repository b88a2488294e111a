"""TensorBoard event-file writer (train/tb_events.py).

Two verification layers:
  * fast tier — self-contained decode (CRC-checked TFRecord framing +
    protobuf field parse) of files the writer produced;
  * slow tier — TensorFlow's own summary_iterator as the authoritative
    reader (TF is installed in this image but absent from production
    TPU hosts, which is exactly why the writer is first-party).

The reference's TensorBoard surface: lib/models.py:399-414 (scalars),
:917-922 (validation summary + FileWriter).
"""

from __future__ import annotations

import numpy as np
import pytest

from cape_tpu.train.tb_events import (
    TBEventWriter,
    crc32c,
    masked_crc,
    read_events,
    tb_tag,
)


def test_crc32c_known_vectors():
    # RFC 3720 / iSCSI test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    # mask is rotl17 + magic, mod 2^32
    c = crc32c(b"123456789")
    assert masked_crc(b"123456789") == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_tb_tag_mapping():
    assert tb_tag("recon") == "train/recon"
    assert tb_tag("val_recon") == "validation/recon"
    assert tb_tag("loss_g_ema") == "averages/loss_g"


def test_same_second_writers_get_distinct_files(tmp_path):
    # Two writers opened on the same logdir within one wall-clock second
    # (quick stop/resume, or two fits sharing a run dir) must not append
    # to one file — that would interleave a second file_version header
    # mid-stream and corrupt the record sequence for TensorBoard.
    a = TBEventWriter(str(tmp_path))
    b = TBEventWriter(str(tmp_path))
    assert a.path != b.path
    a.add_scalar("train/recon", 1.0, 1)
    b.add_scalar("train/recon", 2.0, 1)
    a.close()
    b.close()
    for w, v in ((a, 1.0), (b, 2.0)):
        events = read_events(w.path)
        assert events[0]["file_version"] == "brain.Event:2"
        assert sum("file_version" in e for e in events) == 1
        assert events[1]["scalars"] == {"train/recon": v}


def test_write_and_selfdecode(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(3, {"train/recon": 0.25, "train/loss_g": 1.5})
    w.add_scalar("validation/recon", 0.125, 4)
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(1000).astype(np.float32)
    w.add_histogram("params/w", vals, 4)
    # non-finite histograms are dropped, never written corrupt
    w.add_histogram("params/bad", np.array([1.0, np.nan]), 4)
    w.close()

    events = read_events(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 3
    assert events[1]["scalars"] == pytest.approx(
        {"train/recon": 0.25, "train/loss_g": 1.5}
    )
    assert events[2]["scalars"]["validation/recon"] == pytest.approx(0.125)
    assert events[2]["step"] == 4
    h = events[3]["histograms"]["params/w"]
    assert h["num"] == 1000
    assert h["min"] == pytest.approx(vals.min())
    assert h["max"] == pytest.approx(vals.max())
    assert h["sum"] == pytest.approx(float(vals.sum()), rel=1e-6)
    assert h["sum_squares"] == pytest.approx(float(np.square(vals).sum()), rel=1e-6)
    assert h["bucket"].sum() == 1000
    assert len(h["bucket_limit"]) == len(h["bucket"]) == 30
    assert len(events) == 4  # the nan histogram was skipped


def test_param_histograms_pytree(tmp_path):
    w = TBEventWriter(str(tmp_path))
    params = {"generator": {"conv1": {"w": np.ones((4, 3)), "b": np.zeros(3)}}}
    w.add_param_histograms(7, params)
    w.close()
    events = read_events(w.path)
    tags = {t for ev in events for t in ev["histograms"]}
    assert tags == {"params/generator/conv1/w", "params/generator/conv1/b"}
    assert all(ev["step"] == 7 for ev in events[1:])


@pytest.mark.slow
def test_tensorflow_reads_our_files(tmp_path):
    tf = pytest.importorskip("tensorflow")
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(10, {"train/recon": 0.5})
    vals = np.linspace(-1.0, 1.0, 256)
    w.add_histogram("params/w", vals, 11)
    w.close()

    events = list(tf.compat.v1.train.summary_iterator(w.path))
    assert events[0].file_version == "brain.Event:2"
    ev = events[1]
    assert ev.step == 10
    assert ev.summary.value[0].tag == "train/recon"
    assert ev.summary.value[0].simple_value == pytest.approx(0.5)
    hv = events[2].summary.value[0]
    assert events[2].step == 11
    assert hv.tag == "params/w"
    assert hv.histo.num == 256
    assert hv.histo.min == pytest.approx(-1.0)
    assert hv.histo.max == pytest.approx(1.0)
    assert sum(hv.histo.bucket) == 256
