"""ISO BMFF (MP4) container demuxer tests: byte-exact round trips
through the pure-stdlib writer + reader (operators/mp4.py), including
the multi-run stsc expansion, the co64 64-bit offset path, stss
keyframe flags, and the absent-stss = all-sync rule."""

from __future__ import annotations

import pytest

from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
    Box,
    demux_mp4,
    encode_mp4,
    extract_samples,
    find_box,
    parse_boxes,
)


def _payloads(n, base=11):
    # distinct sizes so any offset/size confusion shows up byte-exactly
    return [bytes([i % 256]) * (base + 7 * i) for i in range(n)]


def test_box_tree_shape():
    data = encode_mp4(_payloads(5))
    tree = parse_boxes(data)
    assert [b.type for b in tree] == [b"ftyp", b"mdat", b"moov"]
    assert sum(b.size for b in tree) == len(data)
    stbl = find_box(tree, b"moov", b"trak", b"mdia", b"minf", b"stbl")
    assert stbl is not None
    assert {c.type for c in stbl.children} >= {
        b"stsd", b"stts", b"stsc", b"stsz", b"stco",
    }


def test_roundtrip_samples_exact():
    pls = _payloads(7)
    data = encode_mp4(
        pls, fps=25, width=320, height=240, keyframes=[0, 3, 6],
        samples_per_chunk=3,  # chunks 3+3+1: trailing partial -> 2 stsc runs
    )
    (track,) = demux_mp4(data)
    assert track.handler == "vide" and track.codec == "avc1"
    assert (track.width, track.height) == (320, 240)
    assert track.timescale == 25_000 and track.duration == 7_000
    assert len(track.samples) == 7
    assert [s.size for s in track.samples] == [len(p) for p in pls]
    assert [s.dts for s in track.samples] == [i * 1000 for i in range(7)]
    assert track.keyframe_indices == [0, 3, 6]
    assert extract_samples(data, track) == pls
    assert extract_samples(data, track, [2, 5]) == [pls[2], pls[5]]


def test_co64_path():
    pls = _payloads(4)
    data = encode_mp4(pls, force_co64=True)
    (track,) = demux_mp4(data)
    assert extract_samples(data, track) == pls


def test_absent_stss_means_all_sync():
    data = encode_mp4(_payloads(3), keyframes=None)
    (track,) = demux_mp4(data)
    assert track.keyframe_indices == [0, 1, 2]


def test_single_chunk_and_single_sample():
    for n, spc in [(1, 1), (6, 100)]:
        pls = _payloads(n)
        data = encode_mp4(pls, samples_per_chunk=spc)
        (track,) = demux_mp4(data)
        assert extract_samples(data, track) == pls


def test_malformed_rejected():
    data = encode_mp4(_payloads(2))
    with pytest.raises(ValueError):
        demux_mp4(data[:-20])  # truncated moov
    with pytest.raises(ValueError):
        demux_mp4(b"\x00\x00\x00\x08mdat")  # no ftyp
    with pytest.raises(ValueError):
        parse_boxes(b"\x00\x00\x00\x03xxxx")  # size < header


class _CountingFile:
    """Seekable binary wrapper counting bytes actually read."""

    def __init__(self, data: bytes):
        import io

        self._f = io.BytesIO(data)
        self.bytes_read = 0

    def seek(self, *a):
        return self._f.seek(*a)

    def tell(self):
        return self._f.tell()

    def read(self, n=-1):
        out = self._f.read(n)
        self.bytes_read += len(out)
        return out


def test_scan_reads_moov_only():
    """The metadata scan must seek PAST mdat: bytes read = box headers
    + moov body, a tiny fraction of a file with a large mdat."""
    from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
        scan_mp4_file,
    )

    pls = [bytes([i]) * 200_000 for i in range(8)]  # 1.6 MB of media
    data = encode_mp4(pls, keyframes=[0, 4])
    f = _CountingFile(data)
    tracks = scan_mp4_file(f)
    assert len(tracks) == 1 and len(tracks[0].samples) == 8
    assert tracks[0].keyframe_indices == [0, 4]
    # headers (3 boxes x 16) + moov (~600B) << 1.6 MB
    assert f.bytes_read < 2_000, f.bytes_read
    assert f.bytes_read < len(data) // 100


def test_fixed_size_stsz_scan_roundtrip(tmp_path):
    """A constant-sample-size stsz (ISO 14496-12 §8.7.3.2, common for
    PCM/CBR audio) must survive the metadata-only scan: pre-fix the
    fixed_size*count sanity bound compared against the MOOV blob size
    instead of the file size, so every valid fixed-stsz track whose
    media outweighed its moov was falsely quarantined."""
    from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
        scan_mp4_file,
    )

    pls = [bytes([i]) * 512 for i in range(64)]  # 32 KB media >> moov
    data = encode_mp4(pls, fixed_stsz=True, keyframes=[0, 8])
    # both paths agree, and sizes come from the fixed form
    (track,) = demux_mp4(data)
    assert [s.size for s in track.samples] == [512] * 64
    p = tmp_path / "cbr.mp4"
    p.write_bytes(data)
    (scanned,) = scan_mp4_file(str(p))
    assert len(scanned.samples) == 64
    assert [s.size for s in scanned.samples] == [512] * 64
    assert scanned.keyframe_indices == [0, 8]
    assert extract_samples(data, scanned) == pls
    # the allocation bound still trips on an absurd fixed size
    bad = bytearray(data)
    i = bytes(bad).index(b"stsz") + 4 + 4
    bad[i : i + 4] = (0xFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError):
        scan_mp4_file(__import__("io").BytesIO(bytes(bad)))


def test_fixed_stsz_materialization_cap():
    """The file-size bound alone admits fixed_size=1 with count ~= the
    file size (tiny samples in a big file) — byte-backed by nothing and
    a multi-GB flattened list if materialized. The cap must trip FIRST,
    before allocation, even when fixed_size*count fits the file."""
    from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
        _MAX_SAMPLES,
    )

    data = bytearray(encode_mp4([b"x" * 32] * 2, fixed_stsz=True))
    i = bytes(data).index(b"stsz") + 4 + 4
    data[i : i + 4] = (1).to_bytes(4, "big")  # fixed_size = 1 byte
    data[i + 4 : i + 8] = (_MAX_SAMPLES + 1).to_bytes(4, "big")
    # pad with a trailing free box so fixed_size*count <= file size
    # (the pre-existing bound passes; only the new cap can reject)
    pad = _MAX_SAMPLES + 1 + 64 - len(data)
    data += (pad + 8).to_bytes(4, "big") + b"free" + b"\x00" * pad
    with pytest.raises(ValueError, match="materialization cap"):
        demux_mp4(bytes(data))


def test_fixed_stsz_rejects_zero_size_samples():
    """sample_size 0 IS the spec's variable-size marker: a fixed-form
    stsz claiming size 0 with no table would be emitted 'valid' but
    quarantined by every parser (including ours) as malformed."""
    with pytest.raises(ValueError, match="nonzero"):
        encode_mp4([b""] * 4, fixed_stsz=True)


def test_ranged_sample_reads(tmp_path):
    from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
        read_mp4_samples,
        scan_mp4_file,
    )

    pls = _payloads(6, base=50)
    p = tmp_path / "v.mp4"
    p.write_bytes(encode_mp4(pls, keyframes=[0, 3]))
    (track,) = scan_mp4_file(str(p))
    assert read_mp4_samples(str(p), track, [1, 4]) == [pls[1], pls[4]]
    assert read_mp4_samples(str(p), track, track.keyframe_indices) == [
        pls[0], pls[3],
    ]


def test_mp4_metadata_datasource(spark, tmp_path):
    """spark.read.format('mp4_metadata'): one row per track with the
    resolved summary; corrupt files become quarantine rows."""
    from nyc_government_hiring_audit_data_platform_spark.sources.mp4_source import (
        read_mp4_metadata,
    )

    for i in range(3):
        pls = _payloads(4 + i)
        (tmp_path / f"v{i}.mp4").write_bytes(
            encode_mp4(pls, width=100 + i, height=50, keyframes=[0])
        )
    (tmp_path / "bad.mp4").write_bytes(b"not an mp4 at all----")
    df = read_mp4_metadata(spark, str(tmp_path / "*.mp4"))
    rows = {r["path"].rsplit("/", 1)[-1]: r.asDict() for r in df.collect()}
    assert len(rows) == 4
    for i in range(3):
        r = rows[f"v{i}.mp4"]
        assert r["error"] is None
        assert r["codec"] == "avc1" and r["handler"] == "vide"
        assert r["width"] == 100 + i and r["n_samples"] == 4 + i
        assert r["n_keyframes"] == 1
        assert r["total_sample_bytes"] == sum(len(p) for p in _payloads(4 + i))
    assert rows["bad.mp4"]["error"] is not None
    assert rows["bad.mp4"]["track_id"] == -1


def test_v1_tkhd_dimensions():
    """Version-1 tkhd (64-bit times, common on long videos) widens the
    TIMES but not track_ID/reserved - a wrong skip reads height where
    width belongs (pre-fix: 640x480 parsed as 480x0)."""
    data = encode_mp4(_payloads(3), width=640, height=480, tkhd_version=1)
    (track,) = demux_mp4(data)
    assert (track.width, track.height) == (640, 480)
    assert track.track_id == 1
    assert extract_samples(data, track) == _payloads(3)


def test_corrupt_sample_table_raises_valueerror(spark, tmp_path):
    """Structure corruption inside the sample tables must surface as
    ValueError (the quarantine contract), never struct.error - a
    bit-flipped stsz count pre-fix killed the whole scan task."""
    from nyc_government_hiring_audit_data_platform_spark.sources.mp4_source import (
        read_mp4_metadata,
    )

    data = bytearray(encode_mp4(_payloads(4)))
    # stsz payload: verflags(4) + sample_size(4) + sample_count(4)
    i = bytes(data).index(b"stsz") + 4 + 4 + 4
    data[i : i + 4] = (1_000_000).to_bytes(4, "big")  # absurd count
    with pytest.raises(ValueError):
        demux_mp4(bytes(data))
    # and through the DataSource it becomes a quarantine row
    (tmp_path / "corrupt.mp4").write_bytes(bytes(data))
    rows = read_mp4_metadata(spark, str(tmp_path / "*.mp4")).collect()
    assert len(rows) == 1 and rows[0]["error"] is not None


def test_resource_exhaustion_bounded():
    """Corrupt counts must raise ValueError BEFORE allocating (a
    bit-flipped fixed-size stsz would otherwise allocate count-sized
    lists / loop billions of dts iterations), and crafted deep box
    nesting is rejected instead of recursing to RecursionError."""
    # fixed-size stsz claiming ~2^48 bytes of samples in a tiny file
    data = bytearray(encode_mp4([b"x" * 32] * 2))
    i = bytes(data).index(b"stsz") + 4 + 4
    data[i : i + 4] = (0xFFFFFF).to_bytes(4, "big")      # fixed_size
    data[i + 4 : i + 8] = (0xFFFFFF).to_bytes(4, "big")  # count
    with pytest.raises(ValueError):
        demux_mp4(bytes(data))
    # stts run describing billions of samples
    data2 = bytearray(encode_mp4([b"x" * 32] * 2))
    j = bytes(data2).index(b"stts") + 4 + 4 + 4  # verflags + entry_count
    data2[j : j + 4] = (2_000_000_000).to_bytes(4, "big")  # run sample_count
    with pytest.raises(ValueError):
        demux_mp4(bytes(data2))
    # 40 nested containers (> the 32-level bound)
    blob = b"\x00" * 0
    for _ in range(40):
        blob = (8 + len(blob)).to_bytes(4, "big") + b"moov" + blob
    with pytest.raises(ValueError):
        parse_boxes(blob)


def test_largesize_box_parses():
    data = encode_mp4(_payloads(2))
    # rewrite mdat as a largesize box: size=1 + 64-bit size after type
    tree = parse_boxes(data)
    mdat = next(b for b in tree if b.type == b"mdat")
    body = data[mdat.start + 8 : mdat.start + mdat.size]
    big = (1).to_bytes(4, "big") + b"mdat" + (len(body) + 16).to_bytes(8, "big") + body
    patched = data[: mdat.start] + big + data[mdat.start + mdat.size :]
    boxes = parse_boxes(patched)
    got = next(b for b in boxes if b.type == b"mdat")
    assert got.header == 16 and got.size == len(body) + 16


def test_mp4_source_store_uri_and_pyarrow_seek(spark, tmp_path):
    """The mp4 source must work for store URIs end-to-end (file: glob
    through the session-free listing layer), and the moov-only scan
    must accept pyarrow's NativeFile - the SEEKABLE handle
    open_any_store returns for real object-store schemes - not just
    builtin file objects."""
    from nyc_government_hiring_audit_data_platform_spark.sources.mp4_source import (
        read_mp4_metadata,
    )

    pls = _payloads(5)
    (tmp_path / "v.mp4").write_bytes(
        encode_mp4(pls, width=320, height=240, keyframes=[0])
    )
    rows = read_mp4_metadata(spark, f"file://{tmp_path}/*.mp4").collect()
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["width"] == 320 and rows[0]["n_samples"] == 5

    # the pyarrow branch open_any_store takes for s3://-class schemes
    from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
        scan_mp4_file,
    )
    from pyarrow import fs as pafs

    fsys, rel = pafs.FileSystem.from_uri(f"file://{tmp_path}/v.mp4")
    with fsys.open_input_file(rel) as f:
        tracks = scan_mp4_file(f)
    assert len(tracks) == 1 and tracks[0].width == 320
