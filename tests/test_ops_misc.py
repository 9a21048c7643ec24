"""Unit tests: top-k per group, text metrics, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.ops import multimodal as mm
from rxlan_aws_lakehouse_spark.ops.multimodal import encode_bmp
from rxlan_aws_lakehouse_spark.ops import text as tx
from rxlan_aws_lakehouse_spark.ops.topk import topk_per_group


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", i) for i in range(3)],
        "g string, v int",
    )
    out = topk_per_group(df, ["g"], [F.desc("v")], k=2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [("g1", 3), ("g1", 4), ("g2", 1), ("g2", 2)]


def test_text_quality_and_lang(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog"), (2, "el perro y la casa de que y")],
        "doc_id long, text string",
    )
    m = tx.quality_metrics(F.col("text"))
    r = df.select("doc_id", m["n_tokens"].alias("n"), m["uniq_ratio"].alias("u")).collect()
    by_id = {x["doc_id"]: x for x in r}
    assert by_id[1]["n"] == 9
    assert 0 < by_id[1]["u"] < 1
    langs = {
        x["doc_id"]: x["lang"]
        for x in df.select("doc_id", tx.predict_lang(F.col("text")).alias("lang")).collect()
    }
    assert langs[1] == "en"
    assert langs[2] == "es"


def test_multimodal_features_schema_and_determinism(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    bin_df = mm.to_binary_payload(df, "doc_id", "text")
    assert dict(bin_df.dtypes)["payload"] == "binary"
    out = mm.extract_features(bin_df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 5
    assert len(rows[1]["feature"]) == mm.FEATURE_DIM
    assert rows[1]["feature"][0] == 5.0  # length moment
    assert rows[2]["feature"] == [0.0] * mm.FEATURE_DIM
    # deterministic across runs
    again = {r["doc_id"]: r["feature"] for r in mm.extract_features(bin_df).collect()}
    assert again[1] == rows[1]["feature"]


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://example.com/x now"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    counts = tx.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("email"),
            counts["url"].alias("url"),
            counts["phone"].alias("phone"),
            tx.scrub_pii(F.col("text")).alias("scrubbed"),
        ).collect()
    }
    assert out[1]["email"] == 1 and out[1]["url"] == 1
    assert "<EMAIL>" in out[1]["scrubbed"] and "<URL>" in out[1]["scrubbed"]
    assert "bob@example.com" not in out[1]["scrubbed"]
    assert out[2]["phone"] == 1 and "<PHONE>" in out[2]["scrubbed"]
    assert out[3]["scrubbed"] == "nothing sensitive here"


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "doc_id long, text string"
    )
    fp = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", tx.rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_pii_redact_leaves_no_matches(spark, sf_dir):
    """After scrub_pii, no PII pattern matches the redacted corpus text
    (placeholders contain no '@', '://', or 8+ digit runs)."""
    from rxlan_aws_lakehouse_spark.queries.llm import text_pii_redact
    from rxlan_aws_lakehouse_spark.catalog import load

    d = load(spark, sf_dir, "documents")
    scrubbed = d.select(tx.scrub_pii(F.col("text")).alias("s"))
    leftover = scrubbed.select(
        *[
            F.sum(F.size(F.regexp_extract_all("s", F.lit(p), 0))).alias(k)
            for k, p in tx.PII_PATTERNS.items()
        ]
    ).first()
    assert all(leftover[k] == 0 for k in tx.PII_PATTERNS)
    # redacted_len/md5 rows exist for every document
    out = text_pii_redact(spark, sf_dir)
    assert out.count() == d.count()


def test_unigram_logprob_bounds(spark, sf_dir):
    """Unigram log2-probs are strictly negative and above log2(1/total);
    every scored doc has >= 1 token."""
    from rxlan_aws_lakehouse_spark.queries.llm import text_unigram_logprob

    rows = text_unigram_logprob(spark, sf_dir).collect()
    assert rows and all(r["n_tokens"] >= 1 for r in rows)
    assert all(r["avg_logprob"] < 0 for r in rows)


def test_quantize_profile_reconstruction(spark, sf_dir):
    """int8 codes stay in [-127, 127] and reconstruct each element to
    within half a quantization step."""
    from rxlan_aws_lakehouse_spark.catalog import load
    from rxlan_aws_lakehouse_spark.queries.llm import emb_quantize_profile

    prof = emb_quantize_profile(spark, sf_dir)
    bad = prof.filter((F.col("q_min") < -127) | (F.col("q_max") > 127))
    assert bad.count() == 0

    e = load(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(v)))
    staged = e.select(
        "embedding", F.when(maxabs > 0, maxabs).otherwise(F.lit(1.0)).alias("scale")
    )
    q = F.transform(
        "embedding", lambda v: F.round(v * 127.0 / F.col("scale")).cast("long")
    )
    recon_err = F.array_max(
        F.zip_with(
            "embedding",
            q,
            lambda v, code: F.abs(v - code * F.col("scale") / 127.0),
        )
    )
    worst = staged.select(
        (recon_err - F.col("scale") / 254.0 * 1.0001).alias("excess")
    ).agg(F.max("excess")).first()[0]
    assert worst <= 1e-9


def test_bmp_encode_decode_round_trip():
    """decode_real is a REAL parser: it must invert encode_bmp exactly —
    including the row padding (width 5 -> 15-byte rows padded to 16),
    bottom-up scanline order, and BGR channel order on disk."""
    grid = {(x, y): ((x * 3 + y) % 256, (y * 5) % 256, (x + 200) % 256)
            for x in range(5) for y in range(3)}
    payload = encode_bmp(5, 3, lambda x, y: grid[(x, y)])
    # spec checks: magic, declared size, 54-byte pixel offset, stride pad
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + 16 * 3  # (5*3 + pad) * 3 rows
    img = mm.decode_real(payload, "image")
    assert (img["format"], img["width"], img["height"]) == ("bmp", 5, 3)
    # pixels come back top-down row-major RGB — exactly the input grid
    expect = [grid[(x, y)] for y in range(3) for x in range(5)]
    assert img["pixels"] == expect


def test_decode_real_rejects_non_bmp():
    with pytest.raises(ValueError, match="not a BMP"):
        mm.decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64, "image")
    with pytest.raises(ValueError, match="not a BMP"):
        mm.decode_real(b"BM", "audio")
    # real container, unsupported variant (8bpp) must refuse, not garble
    bad = bytearray(encode_bmp(2, 2, lambda x, y: (0, 0, 0)))
    bad[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unsupported BMP"):
        mm.decode_real(bytes(bad), "image")


def test_decode_features_real_pipeline(spark):
    """Spark end to end: synthesize BMPs, decode with the real parser,
    check a hand-computed channel mean."""
    df = spark.createDataFrame(
        [(3, "hello world"), (7, "abc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in mm.decode_features(mm.make_bmp_payloads(df)).collect()
    }
    r3 = out[3]
    # doc 3: w = 4+3%5 = 7, h = 3+3%3 = 3; mean_r = avg((21+y)%256) = 22
    assert (r3["fmt"], r3["width"], r3["height"]) == ("bmp", 7, 3)
    assert r3["mean_r"] == pytest.approx(22.0)
    assert r3["mean_b"] == pytest.approx(float(len("hello world") % 256))


def test_strip_markup_semantics(spark):
    """Unit semantics the oracle's aggregate hash can't isolate: content
    of script/style dropped entirely, tags become separators (no word
    fusing), entities unescape once, whitespace collapses."""
    rows = spark.createDataFrame(
        [
            (1, 'a<script x="y">var q = "<b>"</script>b'),
            (2, "x<style>.c{color:red}</style>y"),
            (3, "one<br/>two<!-- hidden words -->three"),
            (4, "5 &lt; 6 &amp;&amp; 7 &gt; 2, &quot;q&quot; &#39;s&#39;"),
            (5, "  spaced   <p>  out  </p>  "),
            (6, "plain text untouched"),
        ],
        "id long, t string",
    ).select("id", tx.strip_markup(F.col("t")).alias("c"), tx.tag_count(F.col("t")).alias("n"))
    got = {r["id"]: (r["c"], r["n"]) for r in rows.collect()}
    assert got[1] == ("a b", 3)  # script gone; its "<b>" string counts as raw markup density
    assert got[2] == ("x y", 2)
    assert got[3] == ("one two three", 2)  # comment matches the raw-density counter too
    assert got[4] == ('5 < 6 && 7 > 2, "q" \'s\'', 0)
    assert got[5] == ("spaced out", 2)
    assert got[6] == ("plain text untouched", 0)


def test_decode_real_rejects_degenerate_dimensions():
    import struct

    bad = bytearray(encode_bmp(2, 2, lambda x, y: (0, 0, 0)))
    struct.pack_into("<i", bad, 18, 0)  # width = 0
    with pytest.raises(ValueError, match="degenerate"):
        mm.decode_real(bytes(bad), "image")
    bad2 = bytearray(encode_bmp(2, 2, lambda x, y: (0, 0, 0)))
    struct.pack_into("<i", bad2, 22, 0)  # height = 0
    with pytest.raises(ValueError, match="degenerate"):
        mm.decode_real(bytes(bad2), "image")


def test_wav_encode_decode_round_trip():
    """decode_wav is a REAL parser: it inverts encode_wav exactly —
    int16 two's-complement extremes, stereo interleave, frame count."""
    from rxlan_aws_lakehouse_spark.ops import multimodal as mm

    samples = [0, -1, 1000, -1001, 32767, -32768]
    wav = mm.encode_wav(8000, 2, samples)
    got = mm.decode_wav(wav)
    assert got == {
        "format": "wav",
        "sample_rate": 8000,
        "n_channels": 2,
        "n_frames": 3,
        "samples": samples,
    }
    mono = mm.decode_wav(mm.encode_wav(8100, 1, [5, -5, 7]))
    assert mono["n_channels"] == 1 and mono["n_frames"] == 3


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real WAV files carry LIST/fact/cue chunks; the parser must skip
    them (with RIFF even-padding) and still find fmt/data."""
    import struct

    from rxlan_aws_lakehouse_spark.ops import multimodal as mm

    wav = mm.encode_wav(8000, 1, [1, 2, 3])
    # odd-sized unknown chunk between WAVE id and fmt: pad byte required
    extra = wav[:12] + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00" + wav[12:]
    assert mm.decode_wav(extra)["samples"] == [1, 2, 3]


def test_wav_rejects_bad_payloads():
    import struct

    import pytest as _pytest

    from rxlan_aws_lakehouse_spark.ops import multimodal as mm

    wav = mm.encode_wav(8000, 2, [1, 2, 3, 4])
    with _pytest.raises(ValueError):  # not RIFF
        mm.decode_wav(b"\x00" * 64)
    with _pytest.raises(ValueError):  # RIFF but not WAVE
        mm.decode_wav(wav[:8] + b"AVI " + wav[12:])
    with _pytest.raises(ValueError):  # wrong modality
        mm.decode_wav(wav, modality="image")
    with _pytest.raises(ValueError):  # truncated data chunk
        mm.decode_wav(wav[:-3])
    # non-PCM format tag
    bad_fmt = bytearray(wav)
    struct.pack_into("<H", bad_fmt, 20, 3)  # IEEE float tag
    with _pytest.raises(ValueError):
        mm.decode_wav(bytes(bad_fmt))
    # data not frame-aligned for stereo: chop 2 bytes off data, fix size
    misaligned = bytearray(wav[:-2])
    struct.pack_into("<I", misaligned, 40, 6)  # data size 8 -> 6
    with _pytest.raises(ValueError):
        mm.decode_wav(bytes(misaligned))


def test_grid_self_join_boundary_completeness(spark):
    """Pairs straddling cell boundaries must not be missed: points sit
    exactly on and around multiples of eps. Verify against brute force."""
    from rxlan_aws_lakehouse_spark.ops.geo import grid_self_join

    pts = [
        (1, 0.0, 0.0),
        (2, 1.0, 0.0),    # same cell band, d=1
        (3, 1.05, 0.0),   # adjacent cell (eps=1), d=1.05 from p1 -> out
        (4, -0.95, 0.0),  # adjacent negative cell, d=0.95 -> in
        (5, 0.0, 1.0),    # d=1 vertically -> in (<= eps)
        (6, 0.7, 0.7),    # diagonal, d=0.99 -> in
        (7, 5.0, 5.0),    # far away
    ]
    df = spark.createDataFrame(pts, "id int, lon double, lat double")
    got = {
        (r["i"], r["j"])
        for r in grid_self_join(df, eps=1.0).collect()
    }
    import itertools

    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 1.0
    }
    assert got == want and (1, 2) in got and (1, 3) not in got
