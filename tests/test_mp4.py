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
