"""Round-8 operator units: PCM WAV parsing (against stdlib ``wave``
output — the parser must agree with an independent writer), C4 line
filtering, and CCNet paragraph-hash dedup."""

from __future__ import annotations

import io
import struct
import wave

from pyspark.sql import functions as F

from interop_spark.operators.dedup import paragraph_chunks, paragraph_dedup
from interop_spark.operators.multimodal import audio_stats, parse_wav
from interop_spark.operators.text import c4_line_filter


def _wav_bytes(samples, channels=1, width=2, rate=8000):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(width)
    w.setframerate(rate)
    if width == 2:
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    else:
        w.writeframes(bytes(s + 128 for s in samples))
    w.close()
    return buf.getvalue()


class TestParseWav:
    def test_16bit_stereo_matches_wave_module(self):
        samples = [100, -200, 300, -400, 32767, -32768]
        got = parse_wav(_wav_bytes(samples, channels=2, rate=44100))
        assert got == (
            2, 44100, 16, 3, sum(v * v for v in samples), 32768,
        )

    def test_8bit_mono_unsigned_centering(self):
        # 8-bit WAV stores unsigned bytes centered at 128
        got = parse_wav(_wav_bytes([0, 2, -2, 127, -128], width=1))
        assert got == (1, 8000, 8, 5, 4 + 4 + 127 * 127 + 128 * 128, 128)

    def test_odd_length_chunk_padding(self):
        # a 3-byte odd chunk before fmt must be skipped with its pad byte
        inner = _wav_bytes([5])
        data = (
            b"RIFF" + struct.pack("<I", len(inner) - 8 + 12) + b"WAVE"
            + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
            + inner[12:]
        )
        assert parse_wav(data) == (1, 8000, 16, 1, 25, 5)

    def test_garbage_and_truncated(self):
        assert parse_wav(None) is None
        assert parse_wav(b"not a wav") is None
        assert parse_wav(b"RIFF\x00\x00\x00\x00WAVE") is None

    def test_non_pcm_returns_header_only(self):
        # format tag 3 (IEEE float): header info, NULL stats
        body = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(body)) + body
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        assert parse_wav(data) == (1, 8000, 32, None, None, None)

    def test_audio_stats_dataframe(self, spark):
        rows = [
            (1, _wav_bytes([10, -20, 30])),
            (2, b"garbage"),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "media_id: long, data: binary")
        got = {r["media_id"]: r for r in audio_stats(df).collect()}
        assert got[1]["sum_sq"] == 100 + 400 + 900
        assert got[1]["n_frames"] == 3
        assert got[2]["sample_rate"] is None
        assert got[3]["peak"] is None


class TestC4LineFilter:
    def _run(self, spark, text):
        df = spark.range(1).select(F.lit(text).alias("t"))
        return df.select(c4_line_filter(F.col("t")).alias("r")).collect()[0][
            "r"
        ]

    def test_keeps_terminal_punctuated_long_lines(self, spark):
        text = (
            "this line has enough words to keep.\n"
            "short line.\n"
            "this line has no terminal punctuation at all\n"
            'a quoted line with five words here."'
        )
        r = self._run(spark, text)
        assert r["n_lines"] == 4
        assert r["n_kept"] == 2  # line 2 too short, line 3 no terminal
        assert r["clean_text"].count("\n") == 1

    def test_doc_level_rules(self, spark):
        ok = "\n".join(["one two three four five."] * 3)
        assert self._run(spark, ok)["doc_ok"] is True
        # curly brace kills the doc even with enough kept lines
        assert self._run(spark, ok + "\nvar x = {")["doc_ok"] is False
        assert (
            self._run(spark, ok + "\nLorem Ipsum dolor sit amet.")["doc_ok"]
            is False
        )
        # fewer than 3 kept lines kills the doc
        two = "\n".join(["one two three four five."] * 2)
        assert self._run(spark, two)["doc_ok"] is False


class TestParagraphDedup:
    def test_chunks_grid(self, spark):
        df = spark.range(1).select(
            F.lit("a b c d e f g h i j").alias("t")
        )
        got = df.select(
            paragraph_chunks(F.col("t"), 8).alias("c")
        ).collect()[0]["c"]
        assert got == ["a b c d e f g h", "i j"]

    def test_first_occurrence_wins_cross_doc(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"
        rows = [
            (1, shared + " unique1 a b c d e f g"),
            (2, shared + " other2 q r s t u v w"),
            (3, "totally different words here x y z"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {
            r["doc_id"]: r
            for r in paragraph_dedup(df, "text", "doc_id").collect()
        }
        assert got[1]["n_chunks"] == 2 and got[1]["n_kept"] == 2
        # doc 2 loses the shared leading chunk to doc 1
        assert got[2]["n_chunks"] == 2 and got[2]["n_kept"] == 1
        assert got[3]["n_kept"] == got[3]["n_chunks"]
        assert got[2]["clean_md5"] is not None

    def test_identical_docs_second_empties(self, spark):
        rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {
            r["doc_id"]: r
            for r in paragraph_dedup(df, "text", "doc_id").collect()
        }
        assert got[1]["n_kept"] == 1
        assert got[2]["n_kept"] == 0
        assert got[2]["clean_md5"] is None


class TestIvfpqRerank:
    def test_exact_reorder_and_shortlist_subset(self, spark, sf_dir):
        from interop_spark.io import load
        from interop_spark.operators.pq import (
            ivfpq_rerank,
            ivfpq_search,
            pq_train,
        )

        e = load(spark, sf_dir, "embeddings")
        cent = e.where(F.col("vec_id") < 8).selectExpr(
            "vec_id AS centroid_id", "embedding AS centroid"
        )
        cbs = pq_train(e, m_subspaces=4, k=4, iters=1, dim=64)
        q = [
            float(x)
            for x in e.where(F.col("vec_id") == 1)
            .select("embedding")
            .collect()[0][0]
        ]
        short = ivfpq_search(e, cent, cbs, q, k=30, nprobe=2)
        rr = ivfpq_rerank(e, cent, cbs, q, k=10, shortlist=30, nprobe=2)
        short_ids = {r["vec_id"] for r in short.collect()}
        rows = rr.collect()
        assert len(rows) == 10
        assert {r["vec_id"] for r in rows} <= short_ids
        dists = [r["exact_dist"] for r in rows]
        assert dists == sorted(dists)
        # the query vector itself must be its own exact-nearest hit
        assert rows[0]["vec_id"] == 1 and rows[0]["exact_dist"] == 0.0


def test_encoding_quality_counters(spark):
    from pyspark.sql import functions as F

    from interop_spark.operators.text import encoding_quality

    rows = [
        (1, "clean ascii text"),
        (2, "bad caf\u00c3\u00a9 and \u00e2\u20ac\u2122 smart quote"),
        (3, "repl \ufffd\ufffd chars"),
        (4, "ctrl\u0007\u0008here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r.id: r
        for r in df.select(
            "id", encoding_quality(F.col("text")).alias("q")
        ).select("id", "q.*").collect()
    }
    assert out[1].enc_ok and out[1].n_mojibake == 0
    assert out[2].n_mojibake == 2 and not out[2].enc_ok
    assert out[3].n_replacement == 2
    assert out[4].n_control == 2


def test_script_profile_dominant(spark):
    from pyspark.sql import functions as F

    from interop_spark.operators.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "\u6c49\u5b57\u6d4b\u8bd5 ok"),  # 4 CJK vs 2 latin
        (3, "\u043f\u0440\u0438\u0432\u0435\u0442"),
        (4, "12345 !!!"),  # no script chars at all
        (5, "ab \u6c49\u5b57"),  # 2 latin vs 2 cjk tie -> latin
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r.id: r
        for r in df.select(
            "id", script_profile(F.col("text")).alias("s")
        ).select("id", "s.*").collect()
    }
    assert out[1].dominant == "latin"
    assert out[2].dominant == "cjk" and out[2].n_cjk == 4
    assert out[3].dominant == "cyrillic"
    assert out[4].dominant is None
    assert out[5].dominant == "latin"  # declaration-order tie-break
