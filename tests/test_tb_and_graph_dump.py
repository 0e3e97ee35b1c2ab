"""TensorBoard event-file writer + computation-graph dump tests.

The TBWriter round-trip decoder here is written independently of the
encoder (it walks TFRecord frames, re-checks both masked crc32c fields,
and parses the Event/Summary protos field-by-field), so an encoding bug
on either side fails the test rather than cancelling out.

Reference analogs: torch SummaryWriter scalar logging (reference
utils/logger.py usage) and utils/visualize_graph.py autograd-graph dump.
"""

import json
import os
import struct
import zlib

import jax
import jax.numpy as jnp
import pytest

from veto_tpu.utils.graph_dump import dump_computation_graph
from veto_tpu.utils.logger import JSONLWriter
from veto_tpu.utils.tb_writer import TBWriter

# ---- independent TFRecord / proto decoder ----------------------------------


def _crc32c_ref(data: bytes) -> int:
    # independent table-free bitwise implementation (Castagnoli poly)
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _unmask(masked: int) -> int:
    rot = (masked - 0xA282EAD8) & 0xFFFFFFFF
    return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert _unmask(len_crc) == _crc32c_ref(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (pay_crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert _unmask(pay_crc) == _crc32c_ref(payload)
        records.append(payload)
        off += 12 + length + 4
    return records


def _parse_fields(buf):
    """Yield (field_number, wire_type, value) triples from a proto buffer."""
    off = 0
    while off < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            (val,) = struct.unpack_from("<d", buf, off)
            off += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[off:off + ln]
            off += ln
        elif wire == 5:  # 32-bit
            (val,) = struct.unpack_from("<f", buf, off)
            off += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        yield num, wire, val


def _decode_event(payload):
    ev = {}
    for num, _, val in _parse_fields(payload):
        if num == 1:
            ev["wall_time"] = val
        elif num == 2:
            ev["step"] = val
        elif num == 3:
            ev["file_version"] = val.decode()
        elif num == 5:
            for n2, _, v2 in _parse_fields(val):
                if n2 == 1:  # Summary.Value
                    for n3, _, v3 in _parse_fields(v2):
                        if n3 == 1:
                            ev["tag"] = v3.decode()
                        elif n3 == 2:
                            ev["simple_value"] = v3
    return ev


# ---- tests ------------------------------------------------------------------


def test_tb_writer_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 10)
    w.add_scalar("lr", 2.5e-4, 10)
    w.add_scalar("loss", 0.75, 20)
    w.flush()
    w.close()

    records = _read_records(w.path)
    events = [_decode_event(r) for r in records]
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = events[1:]
    assert [(e["tag"], e["step"]) for e in scalars] == [
        ("loss", 10), ("lr", 10), ("loss", 20)]
    assert scalars[0]["simple_value"] == pytest.approx(1.5)
    assert scalars[1]["simple_value"] == pytest.approx(2.5e-4)
    assert scalars[2]["simple_value"] == pytest.approx(0.75)
    assert all(e["wall_time"] > 1e9 for e in scalars)


def test_crc32c_known_vectors():
    # published crc32c test vectors (RFC 3720 appendix-style)
    from veto_tpu.utils.tb_writer import _crc32c
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_jsonl_writer_tensorboard_mirror(tmp_path):
    w = JSONLWriter(str(tmp_path), tensorboard=True)
    w.write(5, {"loss": 2.0, "note": "not-a-number"})
    w.write(6, {"loss": 1.0})
    w._tb.close()

    with open(w.path) as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["step"] == 5 and rows[1]["loss"] == 1.0

    tb_dir = os.path.join(str(tmp_path), "tb")
    (event_file,) = os.listdir(tb_dir)
    events = [_decode_event(r)
              for r in _read_records(os.path.join(tb_dir, event_file))]
    scalars = [e for e in events if "tag" in e]
    # the non-numeric entry stays JSONL-only
    assert [(e["tag"], e["step"], e["simple_value"]) for e in scalars] == [
        ("loss", 5, 2.0), ("loss", 6, 1.0)]


def test_jsonl_writer_default_no_tb(tmp_path):
    w = JSONLWriter(str(tmp_path))
    w.write(1, {"loss": 3.0})
    assert not os.path.exists(os.path.join(str(tmp_path), "tb"))


def test_graph_dump(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w).sum()

    args = (jnp.ones((4, 8)), jnp.ones((8, 2)))
    written = dump_computation_graph(
        fn, args, str(tmp_path), name="toy", optimized=False)

    jaxpr_txt = open(written["jaxpr"]).read()
    assert "tanh" in jaxpr_txt and "dot_general" in jaxpr_txt

    dot = open(written["dot"]).read()
    assert dot.startswith("digraph")
    assert "tanh" in dot and "dot_general" in dot
    # unoptimized dump is the lowered StableHLO module text
    hlo = open(written["hlo"]).read()
    assert "HloModule" in hlo or "module @" in hlo


def test_graph_dump_optimized(tmp_path):
    def fn(x):
        return (x * 2.0).sum()

    written = dump_computation_graph(
        fn, (jnp.ones((8,)),), str(tmp_path), name="opt",
        optimized=True, dot=False)
    assert "dot" not in written
    hlo = open(written["hlo"]).read()
    assert "HloModule" in hlo
