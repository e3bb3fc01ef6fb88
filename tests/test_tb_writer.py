"""TB event-file writer: TFRecord framing, CRC, proto round-trip."""

import json
import os
import struct

import numpy as np

from deep3d_aerial_tpu.train.tb_writer import (
    EventWriter, _masked_crc, crc32c, save_scalars,
)


def read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (n,) = struct.unpack("<Q", hdr)
            (crc_hdr,) = struct.unpack("<I", f.read(4))
            assert crc_hdr == _masked_crc(hdr)
            data = f.read(n)
            (crc_data,) = struct.unpack("<I", f.read(4))
            assert crc_data == _masked_crc(data)
            out.append(data)
    return out


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_scalar_events_round_trip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    save_scalars(w, "test", {"abs_error": 0.1, "acc": [0.9, 0.8]}, 3)
    w.close()

    events = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(events) == 1
    records = read_records(os.path.join(tmp_path, events[0]))
    # 1 header event + 2 scalars + 3 from save_scalars
    assert len(records) == 6
    blob = b"".join(records)
    assert b"train/loss" in blob
    assert b"test/abs_error" in blob and b"test/acc_1" in blob
    # the float 0.25 appears in wire format (field 2, fixed32)
    assert struct.pack("<f", 0.25) in blob

    lines = [json.loads(x) for x in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    assert {(x["tag"], x["value"]) for x in lines} >= {
        ("train/loss", 0.5), ("test/abs_error", 0.1), ("test/acc_1", 0.8)}


def test_image_event(tmp_path):
    w = EventWriter(str(tmp_path))
    img = np.linspace(0, 1, 64 * 48).reshape(48, 64)
    w.add_image("depth/est", img, 5)
    w.close()
    events = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    records = read_records(os.path.join(tmp_path, events[0]))
    assert any(b"\x89PNG" in r for r in records)  # embedded PNG
