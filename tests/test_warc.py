"""WARC parser: constructed-archive round-trips, multi-record chunks,
gzip members, non-response record types, malformed tails."""

from __future__ import annotations

import zlib

from pmcanalysis_spark.sources.warc import (
    build_warc_record,
    parse_warc_bytes,
    parse_warc_records,
)


def test_parse_single_record_roundtrip():
    body = b"hello warc world"
    rec = build_warc_record("https://x.org/a", "2024-01-01T00:00:00Z", body)
    out = parse_warc_bytes(rec)
    assert len(out) == 1
    r = out[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "https://x.org/a"
    assert r["warc_date"] == "2024-01-01T00:00:00Z"
    assert r["http_status"] == 200
    assert r["body"] == body
    # WARC Content-Length covers the whole HTTP block
    assert r["content_length"] == len(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Length: 16\r\n\r\n" + body
    )


def test_parse_concatenated_and_gzip_members():
    recs = [
        build_warc_record(f"https://x.org/{i}", "2024-01-01T00:00:00Z",
                          f"body {i}".encode(), gzip_member=(i % 2 == 1))
        for i in range(5)
    ]
    out = parse_warc_bytes(b"".join(recs))
    assert [r["target_uri"] for r in out] == [f"https://x.org/{i}" for i in range(5)]
    assert [r["body"] for r in out] == [f"body {i}".encode() for i in range(5)]


def test_non_response_record_and_binary_body():
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 9\r\n\r\n"
        b"robots: x\r\n\r\n"
    )
    png_ish = bytes(range(256))
    resp = build_warc_record(
        "https://x.org/img", "2024-01-01T00:00:01Z", png_ish,
        content_type="image/png",
    )
    out = parse_warc_bytes(info + resp)
    assert out[0]["warc_type"] == "warcinfo"
    assert out[0]["http_status"] is None
    assert out[0]["body"] == b"robots: x"
    assert out[1]["body"] == png_ish


def test_malformed_tail_keeps_parsed_prefix():
    good = build_warc_record("https://x.org/a", "2024-01-01T00:00:00Z", b"ok")
    out = parse_warc_bytes(good + b"GARBAGE NOT A RECORD")
    assert len(out) == 1 and out[0]["body"] == b"ok"


def test_spark_operator_explodes_chunks(spark):
    blobs = []
    for cid in range(3):
        recs = [
            build_warc_record(
                f"https://x.org/{cid}/{i}", "2024-01-01T00:00:00Z",
                f"chunk {cid} rec {i}".encode(), gzip_member=(cid == 2),
            )
            for i in range(4)
        ]
        blobs.append((cid, b"".join(recs)))
    chunks = spark.createDataFrame(blobs, "chunk_id long, payload binary")
    out = parse_warc_records(chunks).collect()
    assert len(out) == 12
    got = {(r.chunk_id, r.rec_idx): (r.target_uri, bytes(r.body)) for r in out}
    for cid in range(3):
        for i in range(4):
            assert got[(cid, i)] == (
                f"https://x.org/{cid}/{i}", f"chunk {cid} rec {i}".encode()
            )


def test_gzip_member_is_real_gzip():
    rec = build_warc_record("https://x.org/a", "2024-01-01T00:00:00Z", b"z",
                            gzip_member=True)
    assert rec[:2] == b"\x1f\x8b"
    inflated = zlib.decompress(rec, 16 + zlib.MAX_WBITS)
    assert inflated.startswith(b"WARC/1.0\r\n")


def test_write_warc_shards_roundtrip(spark):
    """Sink half: shard archives round-trip through the parser — every
    record recovered in uri order, gzip members by default."""
    rows = [
        (i % 3, f"https://x.org/{i:03d}", "2024-01-01T00:00:00Z", f"text {i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "shard_id long, uri string, date string, text string"
    )
    from pmcanalysis_spark.sources.warc import write_warc_shards

    shards = write_warc_shards(docs).collect()
    assert len(shards) == 3
    for s in shards:
        assert s.n_records == 10
        recs = parse_warc_bytes(bytes(s.payload))
        uris = [r["target_uri"] for r in recs]
        assert uris == sorted(uris) and len(uris) == 10
        for r in recs:
            i = int(r["target_uri"].rsplit("/", 1)[1])
            assert i % 3 == s.shard_id
            assert r["body"] == f"text {i}".encode()
