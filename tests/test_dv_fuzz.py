"""Differential fuzz of the deletion-vector codec (round-10 fourth wave).

The DV bitmap is the one byte-level format where a silent decode bug means
silently WRONG ROWS (a mis-decoded index deletes the wrong row or
resurrects a deleted one), and until now its proof was a handful of fixed
roundtrip cases plus whatever shapes the reference's golden tables happen
to contain. Three gaps this fuzz closes:

1. **Container-boundary roundtrips** — random sets stressing the
   array/bitmap threshold (cardinality 4096), the 16-bit container edges
   (0, 65535, 65536), multi-bucket 64-bit values, and dense runs, via
   encode_treemap -> decode_treemap.
2. **Run-container READ** — the engine never WRITES run containers
   (writers emit array+bitmap, like the reference:
   kernel/src/actions/deletion_vector_writer.rs), so roundtrip fuzz can't
   reach the run-decode branch; foreign tables (delta-spark compactions)
   do ship runs. A test-local encoder emits the official run format
   (SERIAL_COOKIE, run_flags bitset, offset header iff n >= 4 containers)
   and the engine's decoder must agree with the model set.
3. **File/descriptor plumbing** — multi-blob DV files (shared files with
   nonzero offsets), CRC verification, z85 inline descriptors at every
   tail alignment, and the 'u' path scheme, via write_dv_file +
   read_dv_row_indexes against a storage handler.

Ground truth is the generating set itself — the codec is a bijection, so
roundtrip equality IS the spec (reference treemap contract:
kernel/src/actions/deletion_vector.rs:18-70, magic 1681511377 + portable
64-bit roaring).

Seeds are fixed for reproducibility; no failures found by this fuzz to
date (first run was green — the codec predates it and was already pinned
by golden tables; the run-read branch is the new coverage).
"""

from __future__ import annotations

import random
import struct

import pytest

from delta_kernel_rs_spark.functions.dv import (
    DV_MAGIC,
    SERIAL_COOKIE,
    SERIAL_COOKIE_NO_RUN,
    decode_treemap,
    encode_treemap,
    extract_dv_blob,
    read_dv_row_indexes,
    write_dv_file,
    z85_decode,
    z85_encode,
)

# ---------------------------------------------------------------------------
# model-side encoder: official roaring WITH run containers


def _encode_run_container(runs: list[tuple[int, int]]) -> bytes:
    """Official run container: u16 n_runs, then (start, length-1) u16 pairs."""
    out = bytearray(struct.pack("<H", len(runs)))
    for start, length in runs:
        out += struct.pack("<HH", start, length - 1)
    return bytes(out)


def _encode_roaring32_with_runs(values: list[int], run_prob: float, rng) -> bytes:
    """32-bit roaring serialization that MAY emit run containers.

    Mirrors the official format (RoaringFormatSpec): cookie SERIAL_COOKIE
    with container count in the high 16 bits, a run-flag bitset, the
    descriptive header, an offset header iff >= 4 containers, then the
    container bodies in key order.
    """
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    assert n >= 1

    bodies: list[bytes] = []
    is_run: list[bool] = []
    for k in keys:
        vals = sorted(containers[k])
        use_run = rng.random() < run_prob
        if use_run:
            runs: list[tuple[int, int]] = []
            for v in vals:
                if runs and v == runs[-1][0] + runs[-1][1]:
                    runs[-1] = (runs[-1][0], runs[-1][1] + 1)
                else:
                    runs.append((v, 1))
            bodies.append(_encode_run_container(runs))
            is_run.append(True)
        elif len(vals) <= 4096:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
            is_run.append(False)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
            is_run.append(False)

    out = bytearray(struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16)))
    flags = bytearray((n + 7) // 8)
    for i, r in enumerate(is_run):
        if r:
            flags[i // 8] |= 1 << (i % 8)
    out += bytes(flags)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    if n >= 4:
        header_len = len(out) + 4 * n
        cursor = header_len
        for body in bodies:
            out += struct.pack("<I", cursor)
            cursor += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def _encode_treemap_with_runs(row_indexes: list[int], run_prob: float, rng) -> bytes:
    buckets: dict[int, list[int]] = {}
    for v in sorted(row_indexes):
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<IQ", DV_MAGIC, len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _encode_roaring32_with_runs(buckets[high], run_prob, rng)
    return bytes(out)


# ---------------------------------------------------------------------------
# random set generators — shaped to hit the codec's structural boundaries


def _random_rowset(rng: random.Random) -> list[int]:
    shape = rng.randrange(7)
    if shape == 0:  # sparse array container
        return sorted(rng.sample(range(65536), rng.randrange(1, 50)))
    if shape == 1:  # cardinality straddling the 4096 array/bitmap threshold
        card = rng.choice([4095, 4096, 4097, 5000])
        return sorted(rng.sample(range(65536), card))
    if shape == 2:  # dense runs (compresses to few runs)
        out: set[int] = set()
        base = rng.randrange(0, 1 << 20)
        for _ in range(rng.randrange(1, 8)):
            start = base + rng.randrange(0, 10000)
            out.update(range(start, start + rng.randrange(1, 300)))
        return sorted(out)
    if shape == 3:  # multiple 16-bit containers
        return sorted(
            {
                (rng.randrange(0, 8) << 16) | rng.randrange(65536)
                for _ in range(rng.randrange(2, 400))
            }
        )
    if shape == 4:  # multiple 32-bit buckets (treemap breadth)
        return sorted(
            {
                (rng.randrange(0, 4) << 32) | rng.randrange(1 << 20)
                for _ in range(rng.randrange(2, 200))
            }
        )
    if shape == 5:  # container-edge values
        pool = [0, 1, 4095, 4096, 65534, 65535, 65536, 65537,
                (1 << 32) - 1, 1 << 32, (1 << 32) + 1, (1 << 33) + 7]
        return sorted(rng.sample(pool, rng.randrange(1, len(pool))))
    # full 16-bit container (all 65536 values — bitmap of all ones)
    hi = rng.randrange(0, 2) << 16
    return [hi + v for v in range(65536)]


SEED = 0xD17A
N_ROUNDTRIP = 300
N_RUNREAD = 200


def test_treemap_roundtrip_fuzz():
    rng = random.Random(SEED)
    for i in range(N_ROUNDTRIP):
        rows = _random_rowset(rng)
        got = decode_treemap(encode_treemap(rows))
        assert got == rows, f"roundtrip mismatch at case {i}: {rows[:10]}..."


def test_run_container_read_fuzz():
    """Decoder vs a model encoder that emits official run containers."""
    rng = random.Random(SEED + 1)
    for i in range(N_RUNREAD):
        rows = _random_rowset(rng)
        run_prob = rng.choice([0.0, 0.5, 1.0])
        blob = _encode_treemap_with_runs(rows, run_prob, rng)
        got = decode_treemap(blob)
        assert got == rows, (
            f"run-read mismatch at case {i} (run_prob={run_prob}): "
            f"want {rows[:10]}..., got {got[:10]}..."
        )


def test_z85_roundtrip_fuzz():
    rng = random.Random(SEED + 2)
    for _ in range(500):
        n = rng.randrange(0, 64)
        data = bytes(rng.randrange(256) for _ in range(n))
        enc = z85_encode(data)
        assert len(enc) % 5 == 0
        assert z85_decode(enc) == data


def test_z85_rejects_mid_stream_pad():
    blob = z85_encode(b"\x01\x02\x03")  # one padded group
    with pytest.raises(ValueError):
        z85_decode(blob + z85_encode(b"\x00\x00\x00\x00"))


class _DictStorage:
    """Minimal storage handler: read_bytes/put_overwrite over a dict."""

    def __init__(self):
        self.files: dict[str, bytes] = {}

    def put_overwrite(self, path: str, data: bytes) -> None:
        self.files[path] = data

    def read_bytes(self, path: str) -> bytes:
        return self.files[path]


def test_dv_file_multi_blob_descriptor_fuzz():
    """write_dv_file + descriptor read-back: shared files, offsets, CRC,
    inline z85 — every descriptor spelling the protocol allows."""
    rng = random.Random(SEED + 3)
    storage = _DictStorage()
    table = "mem://t"
    for _ in range(30):
        sets = [_random_rowset(rng) for _ in range(rng.randrange(1, 5))]
        blobs = [encode_treemap(s) for s in sets]
        enc_uuid, spans = write_dv_file(storage, table, blobs)
        assert len(spans) == len(blobs)
        for rows, (offset, size) in zip(sets, spans):
            desc = {
                "storageType": "u",
                "pathOrInlineDv": enc_uuid,
                "offset": offset,
                "sizeInBytes": size,
                "cardinality": len(rows),
            }
            assert read_dv_row_indexes(storage, table, desc) == rows
        # inline spelling of the first bitmap
        inline = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(blobs[0]),
            "sizeInBytes": len(blobs[0]),
            "cardinality": len(sets[0]),
        }
        assert read_dv_row_indexes(storage, table, inline) == sets[0]


def test_dv_file_crc_corruption_detected():
    rng = random.Random(SEED + 4)
    storage = _DictStorage()
    table = "mem://t"
    rows = _random_rowset(rng)
    enc_uuid, spans = write_dv_file(storage, table, [encode_treemap(rows)])
    (path, blob) = next(iter(storage.files.items()))
    offset, _size = spans[0]
    # flip one payload byte — the CRC check must catch it
    corrupted = bytearray(blob)
    corrupted[offset + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        extract_dv_blob(bytes(corrupted), offset)
