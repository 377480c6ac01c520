"""Binary media columns: real WAV/PNG codecs, chunking.

Split from the original monolithic queries.py (r5 verdict task 5);
registration side effects populate the shared REGISTRY, and the
package __init__ fixes the driver-window order, so module
membership is organization only — zero semantic change.
"""
# ruff: noqa: F403, F405
from __future__ import annotations
from kafka_streams_homework_spark.queries._shared import *  # noqa



@register(
    "media_resize",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   greatest(octet_length(encode(text)) % 640, 1) AS w,
                   greatest(octet_length(encode(text)) % 480, 1) AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
               CAST(floor(w * least(64.0 / greatest(w, h), 1.0)) AS INTEGER) AS thumb_w,
               CAST(floor(h * least(64.0 / greatest(w, h), 1.0)) AS INTEGER) AS thumb_h
        FROM d
    """,
    description="Multimodal resize plumbing: decode∘resize fused into "
    "ONE mapInPandas (single Python/Arrow crossing; PIL decode + "
    "thumbnail swap in for the arithmetic). The unfused two-stage "
    "composition is pinned equal in pytest",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.decode_and_resize(M.to_media(docs))


@register(
    "frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                        ELSE 'audio/wav' END AS media_type,
                   octet_length(encode(text)) AS n,
                   unnest(generate_series(0,
                       least(greatest(octet_length(encode(text)) // 256, 1), 8) - 1)) AS i
            FROM documents
        )
        SELECT doc_id, media_type,
               CAST(i AS INTEGER) AS frame_idx,
               CAST(i * 256 AS BIGINT) AS byte_offset,
               CAST(CASE WHEN n - i * 256 < 256 THEN n - i * 256
                         ELSE 256 END AS BIGINT) AS frame_bytes
        FROM f
    """,
    description="Multimodal frame sampling: variable-fanout mapInPandas "
    "(one payload → N frame rows), Arrow-batched; stride arithmetic "
    "stands in for the codec (plumbing identical to cv2 frame grabs)",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.frame_sample(M.to_media(docs))


# ===========================================================================
# Multimodal (north-star §7)
# ===========================================================================


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                    ELSE 'audio/wav' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height
        FROM documents
    """,
    description="Multimodal plumbing: binary payload column + mapInPandas "
    "decode (stubbed codec, real Arrow batch path)",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.decode_stub(M.to_media(docs))


@register(
    "audio_chunks",
    oracle="""
        WITH a AS (
            SELECT doc_id, text, length(text) AS n FROM documents
            WHERE doc_id % 2 = 1 AND length(text) >= 64
        ), c AS (
            SELECT doc_id, n, text,
                   unnest(list_transform(
                       generate_series(0, CAST((n - 64) // 256 AS INT)),
                       i -> {'idx': i, 's': i * 256 + 1})) AS u
            FROM a
        )
        SELECT doc_id, CAST(u.idx AS INT) AS chunk_idx,
               CAST(least(256, n - u.idx * 256) AS BIGINT) AS n_bytes,
               base64(encode(substring(text, u.s, 256))) AS chunk_b64
        FROM c
    """,
    description="Audio-modality segmentation: slice each audio payload "
    "into 256-byte frames (trailing fragment kept when >= 64 bytes) "
    "via the Arrow mapInPandas hatch — the ASR/audio-embedding "
    "pre-batching step, with REAL byte slicing (nothing faked) and "
    "the chunk bytes themselves oracle-checked via base64 against a "
    "char-sliced reconstruction (exact because the fixture corpus is "
    "pure ASCII — byte == char — verified per-SF). Payload bytes "
    "cross into Python once per Arrow batch; output inherits the "
    "input partitioning",
)
def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = M.to_media(docs)
    return M.audio_chunks(media).select(
        "doc_id",
        "chunk_idx",
        "n_bytes",
        # Spark's base64 is MIME-wrapped (\r\n every 76 chars); DuckDB's
        # is unwrapped — strip to the canonical unwrapped form
        F.translate(F.base64("chunk"), "\r\n", "").alias("chunk_b64"),
    )


@register(
    "wav_pipeline",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   1000 + (doc_id % 20) * 1000 AS amp,
                   8 * (1 + doc_id % 50) AS nf
            FROM documents
        ), q AS (
            SELECT doc_id, amp, nf,
                   CAST(floor(amp * 0.7071067811865476 + 0.5) AS BIGINT) AS r
            FROM p
        )
        SELECT doc_id,
               1 AS n_channels,
               8000 AS sample_rate,
               CAST(nf AS BIGINT) AS n_frames,
               round(nf * 1000.0 / 8000 + 1e-9, 3) AS duration_ms,
               CAST(amp AS INT) AS peak,
               round(sqrt((4.0 * r * r + 2.0 * amp * amp) / 8.0) + 1e-9, 6)
                   AS rms
        FROM q
    """,
    description="REAL media decode, no fake codec: per document a true "
    "PCM16 RIFF/WAV file is synthesized (stdlib `wave` writer — "
    "deterministic sine, amplitude and length derived from doc_id), "
    "then parsed back by the stdlib `wave` READER in a second Arrow-"
    "batched mapInPandas, with peak and RMS computed from the decoded "
    "int16 waveform itself. DuckDB cannot parse RIFF, so the oracle "
    "recomputes the expected features ARITHMETICALLY (the sine peaks "
    "on-sample at 8 samples/period; round-half-up quantization makes "
    "every byte closed-form; integer-exact float64 sums make the RMS "
    "bit-identical) — a full hash check of a genuine codec round-trip. "
    "Closes the audio leg of the decode_real gate "
    "(operators/multimodal.py:271); image/video stay gated on PIL/cv2",
)
def q_wav_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = M.wav_decode(M.synth_wav(docs))
    return feats.select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "n_frames",
        F.round(F.col("duration_ms") + F.lit(1e-9), 3).alias("duration_ms"),
        "peak",
        F.round(F.col("rms") + F.lit(1e-9), 6).alias("rms"),
    )


@register(
    "png_pipeline",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   16 + (doc_id % 16) AS w,
                   16 + (doc_id % 8) AS h
            FROM documents
        ), g AS (
            SELECT p.doc_id, p.w, p.h,
                   SUM((7 * gx.x + 13 * gy.y + p.doc_id) % 256) AS total
            FROM p, range(0, 31) AS gx(x), range(0, 23) AS gy(y)
            WHERE gx.x < p.w AND gy.y < p.h
            GROUP BY p.doc_id, p.w, p.h
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               8 AS bit_depth,
               0 AS color_type,
               round(CAST(total AS DOUBLE) / (w * h) + 1e-9, 6)
                   AS mean_pixel
        FROM g
    """,
    description="REAL image decode, no fake codec: per document a "
    "spec-conformant grayscale-8 PNG is synthesized (zlib DEFLATE + "
    "CRC32 chunks + all five scanline filter types rotating per row, "
    "filter = y % 5), then decoded back by a genuine chunk-walking "
    "decoder — CRC verification, zlib inflate, full Sub/Up/Average/"
    "Paeth unfiltering — in a second Arrow-batched mapInPandas. "
    "Pixel(x,y) = (7x+13y+doc_id) % 256 is closed-form, so DuckDB "
    "recomputes the decoded mean pixel from a lateral range() grid "
    "without inflating a single byte: the hash check proves the "
    "reconstructed bitmap is exact. With wav_pipeline this closes "
    "the image leg of the decode_real gate "
    "(operators/multimodal.py:271); video stays gated on cv2/av",
)
def q_png_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = M.png_decode(M.synth_png(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        "bit_depth",
        "color_type",
        F.round(F.col("mean_pixel") + F.lit(1e-9), 6).alias("mean_pixel"),
    )



AHASH_MAX_HAMMING = 3


@register(
    "image_ahash_dedup",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, 16 + (doc_id % 16) AS w, 16 + (doc_id % 8) AS h
            FROM documents
        ), blk AS (
            SELECT p.doc_id, p.w, p.h,
                   (gy.y * 8) // p.h AS by, (gx.x * 8) // p.w AS bx,
                   SUM((7 * gx.x + 13 * gy.y + p.doc_id) % 256) AS bsum,
                   COUNT(*) AS npix
            FROM p, range(0, 31) AS gx(x), range(0, 23) AS gy(y)
            WHERE gx.x < p.w AND gy.y < p.h
            GROUP BY 1, 2, 3, 4, 5
        ), tot AS (
            SELECT doc_id, SUM(bsum) AS total FROM blk GROUP BY 1
        ), bits AS (
            SELECT b.doc_id, (b.by * 8 + b.bx) AS bit,
                   CASE WHEN b.bsum * (b.w * b.h) >= t.total * b.npix
                        THEN 1 ELSE 0 END AS v
            FROM blk b JOIN tot t USING (doc_id)
        ), bands AS (
            SELECT doc_id, bit // 16 AS band,
                   SUM(v * (1::BIGINT << (bit % 16))) AS bval
            FROM bits GROUP BY 1, 2
        ), sig AS (
            SELECT doc_id,
                   MAX(CASE WHEN band = 0 THEN bval END) AS b0,
                   MAX(CASE WHEN band = 1 THEN bval END) AS b1,
                   MAX(CASE WHEN band = 2 THEN bval END) AS b2,
                   MAX(CASE WHEN band = 3 THEN bval END) AS b3
            FROM bands GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                  + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                  AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
            <= {AHASH_MAX_HAMMING}
    """,
    description="Perceptual image dedup over REALLY decoded bitmaps: "
    "8x8 average-hash per synthesized-then-decoded PNG (integer "
    "cross-multiplied block-vs-global mean compare — no float "
    "anywhere), four 16-bit bands as pigeonhole keys so every "
    "Hamming<=3 pair shares an exact band (candidates never O(n^2)), "
    "exact bit_count verify. The fixture has natural structure: "
    "doc_id and doc_id+256 render the IDENTICAL bitmap (w,h repeat "
    "mod 16/8, pixels mod 256), so exact-duplicate pairs at Hamming "
    "0 must all surface — pinned in pytest. Oracle recomputes the "
    "hash from the closed-form pixel formula and brute-forces pairs; "
    "Spark decodes the actual PNG bytes (CRC walk, inflate, "
    "unfilter), proving the perceptual pipeline end to end. At 100 "
    "TB the plan is one Arrow-batched decode pass + a banded "
    "equi-join on bounded keys — same scale shape as "
    "dedup_simhash_exact",
)
def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sig = tracked_persist(M.png_ahash(M.synth_png(docs)))
    band_cols = [
        F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
        for i in range(4)
    ]
    buckets = sig.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select("doc_id", "b0", "b1", "b2", "b3", "bb.band", "bb.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")))
        for i in range(4)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= AHASH_MAX_HAMMING)
        .distinct()
    )

@register(
    "jpeg_pipeline",
    oracle="""
        WITH blk AS (
            SELECT d.doc_id,
                   2 * ((d.doc_id * 31 + by.y * 7 + bx.x * 13) % 128) AS v
            FROM documents d,
                 range(0, 2) AS by(y), range(0, 3) AS bx(x)
        )
        SELECT doc_id,
               24 AS width,
               16 AS height,
               round(SUM(v)::DOUBLE / 6 + 1e-9, 6) AS mean_pixel,
               CAST(MIN(v) AS INT) AS min_pixel,
               CAST(MAX(v) AS INT) AS max_pixel
        FROM blk GROUP BY doc_id
    """,
    description="REAL baseline JPEG decode (r5 verdict task 6, the "
    "stretch): per document a spec-conformant ITU T.81 baseline "
    "grayscale JPEG is synthesized by the GENERAL float-DCT encoder "
    "(Annex-K quantization + Huffman tables, DC prediction, "
    "run-length AC with ZRL/EOB, byte stuffing), then decoded by a "
    "genuine marker-walking decoder — DQT/DHT/SOF0/SOS parse, "
    "canonical-Huffman entropy decode with un-stuffing, dequantize, "
    "inverse zigzag, float IDCT. The synth image is block-constant "
    "with EVEN values, which makes the lossy codec exactly lossless "
    "(DC-only blocks, integer quantizer quotients), so DuckDB "
    "recomputes every decoded pixel in integers from a 6-row block "
    "grid — the hash check proves the reconstruction bit-exact. The "
    "general lossy path (gradients, high-frequency noise, error "
    "bounds) is pinned in pytest. decode_real now gates VIDEO only "
    "(operators/multimodal.py:271)",
)
def q_jpeg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = M.jpeg_decode(M.synth_jpeg(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("mean_pixel") + F.lit(1e-9), 6).alias("mean_pixel"),
        "min_pixel",
        "max_pixel",
    )

@register(
    "video_pipeline",
    oracle="""
        WITH blk AS (
            SELECT d.doc_id, f.f,
                   2 * ((d.doc_id * 31 + f.f * 11 + by.y * 7
                         + bx.x * 13) % 128) AS v
            FROM documents d, range(0, 5) AS f(f),
                 range(0, 2) AS by(y), range(0, 3) AS bx(x)
        ), m AS (
            SELECT doc_id, f, SUM(v) AS s
            FROM blk GROUP BY doc_id, f
        )
        SELECT doc_id,
               24 AS width, 16 AS height,
               5 AS n_frames, 10 AS fps,
               CAST(500.0 AS DOUBLE) AS duration_ms,
               round(MAX(CASE WHEN f = 0 THEN s END)::DOUBLE / 6
                     + 1e-9, 6) AS mean_first,
               round(MAX(CASE WHEN f = 4 THEN s END)::DOUBLE / 6
                     + 1e-9, 6) AS mean_last
        FROM m GROUP BY doc_id
    """,
    description="REAL video decode — the LAST media gate closes: per "
    "document a Motion-JPEG AVI is synthesized (RIFF muxer: hdrl with "
    "avih/strh/strf MJPG stream headers, movi LIST of 00dc frame "
    "chunks, idx1 index — a container ffmpeg would accept) with 5 "
    "baseline-JPEG frames, then demuxed back by a genuine RIFF "
    "chunk-walking demuxer (signature + header/index consistency "
    "checks) and every frame decoded by the general T.81 decoder. "
    "Even-valued block-constant frames make each frame's decode "
    "exactly lossless, so DuckDB recomputes per-frame means from a "
    "30-row (frame, block) grid — hash-checked. Inter-frame codecs "
    "(H.264) remain a codec-library boundary, documented in "
    "operators/multimodal.py decode_real; MJPEG is the intra-only "
    "video class this engine models end-to-end",
)
def q_video_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = M.video_decode(M.synth_video(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        "fps",
        "duration_ms",
        F.round(F.col("mean_first") + F.lit(1e-9), 6).alias("mean_first"),
        F.round(F.col("mean_last") + F.lit(1e-9), 6).alias("mean_last"),
    )


PHASH_MAX_HAMMING = 2
_PHASH_BASIS_VALUES = ", ".join(
    f"({u}, {x}, {c})"
    for u, row in enumerate(M.DCT_BASIS)
    for x, c in enumerate(row)
)


@register(
    "image_phash_dedup",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, 16 + (doc_id % 16) AS w, 16 + (doc_id % 8) AS h
            FROM documents
        ), blk AS (
            SELECT p.doc_id,
                   (gy.y * 8) // p.h AS by, (gx.x * 8) // p.w AS bx,
                   SUM((7 * gx.x + 13 * gy.y + p.doc_id) % 256) AS bsum,
                   COUNT(*) AS npix
            FROM p, range(0, 31) AS gx(x), range(0, 23) AS gy(y)
            WHERE gx.x < p.w AND gy.y < p.h
            GROUP BY 1, 2, 3
        ), bm AS (
            SELECT doc_id, by, bx, bsum // npix AS m FROM blk
        ), basis AS (
            SELECT * FROM (VALUES {_PHASH_BASIS_VALUES}) AS t(u, i, c)
        ), coefs AS (
            SELECT bm.doc_id, bu.u AS u, bv.u AS v,
                   SUM(bm.m * bu.c * bv.c) AS coef
            FROM bm
            JOIN basis bu ON bu.i = bm.by AND bu.u < 6
            JOIN basis bv ON bv.i = bm.bx AND bv.u < 6
            WHERE NOT (bu.u = 0 AND bv.u = 0)
            GROUP BY 1, 2, 3
        ), med AS (
            SELECT doc_id, coef AS med FROM (
                SELECT doc_id, coef,
                       row_number() OVER (
                           PARTITION BY doc_id ORDER BY coef) AS rn
                FROM coefs
            ) WHERE rn = 18
        ), bits AS (
            SELECT c.doc_id, (c.u * 6 + c.v - 1) AS idx,
                   CASE WHEN c.coef > m.med THEN 1 ELSE 0 END AS b
            FROM coefs c JOIN med m USING (doc_id)
        ), bands AS (
            SELECT doc_id, idx // 12 AS band,
                   SUM(b * (1::BIGINT << (idx % 12))) AS bval
            FROM bits GROUP BY 1, 2
        ), sig AS (
            SELECT doc_id,
                   CAST(MAX(CASE WHEN band = 0 THEN bval END) AS BIGINT)
                       AS b0,
                   CAST(MAX(CASE WHEN band = 1 THEN bval END) AS BIGINT)
                       AS b1,
                   CAST(MAX(CASE WHEN band = 2 THEN bval END) AS BIGINT)
                       AS b2
            FROM bands GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.b0, b.b0))
                    + bit_count(xor(a.b1, b.b1))
                    + bit_count(xor(a.b2, b.b2)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) <= {PHASH_MAX_HAMMING}
    """,
    description="Perceptual DCT-hash (pHash, 35-bit low-frequency block) dedup "
    "over REALLY decoded PNG bitmaps — the frequency-domain sibling of image_ahash_dedup, "
    "robust to brightness shifts and high-frequency noise. The DCT "
    "basis is quantized to fixed-point integers (round(cos*1e6)) and "
    "SHARED verbatim with the oracle SQL, and block means use floor "
    "division, so the whole 35-bit hash is integer arithmetic with "
    "ZERO trig/float-ULP risk across engines. Three 12-bit pigeonhole "
    "bands guarantee every Hamming<=2 pair shares an exact band "
    "(banded equi-join, never O(n^2)); the oracle recomputes "
    "everything from the closed-form synth pixel formula while Spark "
    "decodes actual PNG bytes end to end",
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sig = tracked_persist(M.png_phash(M.synth_png(docs)))
    band_cols = [
        F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
        for i in range(3)
    ]
    buckets = sig.select(
        "doc_id", "b0", "b1", "b2",
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select("doc_id", "b0", "b1", "b2", "bb.band", "bb.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")))
        for i in range(3)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
    )


@register(
    "audio_vad",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   1 + doc_id % 50 AS nfr,
                   1000 + (doc_id % 20) * 1000 AS amp,
                   3 + doc_id % 3 AS per,
                   1 + doc_id % 2 AS duty
            FROM documents
        ), f AS (
            SELECT doc_id, amp, per, duty,
                   unnest(generate_series(0, CAST(nfr - 1 AS INT))) AS j
            FROM p
        ), e AS (
            SELECT doc_id, j, amp,
                   CASE WHEN (j % per) < duty
                        THEN amp ELSE amp // 16 END AS a
            FROM f
        ), en AS (
            SELECT doc_id, j, amp,
                   4 * CAST(floor(a * 0.7071067811865476 + 0.5) AS BIGINT)
                     * CAST(floor(a * 0.7071067811865476 + 0.5) AS BIGINT)
                   + 2 * CAST(a AS BIGINT) * CAST(a AS BIGINT) AS energy
            FROM e
        ), v AS (
            SELECT doc_id, j, energy FROM en
            WHERE energy >= 2 * CAST(amp AS BIGINT) * CAST(amp AS BIGINT)
        ), isl AS (
            SELECT doc_id, j, energy,
                   j - row_number() OVER (
                       PARTITION BY doc_id ORDER BY j) AS grp
            FROM v
        ), seg AS (
            SELECT doc_id, grp, min(j) AS sf, count(*) AS nf,
                   sum(energy) AS se
            FROM isl GROUP BY doc_id, grp
        )
        SELECT doc_id,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY sf) AS BIGINT) AS seg_idx,
               CAST(sf AS BIGINT) AS start_frame,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(se AS BIGINT) AS seg_energy
        FROM seg
    """,
    description="Energy-threshold voice-activity detection over REAL "
    "PCM16 WAV payloads (the ASR preprocessing step next to "
    "audio_chunks' byte batching): per document a burst-gated sine "
    "clip is synthesized (stdlib wave writer; loud/quiet frames from "
    "a doc_id-derived duty cycle), decoded back with the stdlib wave "
    "READER, windowed into 8-sample frames with exact integer "
    "energies (numpy, inside one Arrow batch), then frames whose "
    "energy >= 2*peak^2 (rms >= peak/2 — the threshold derives from "
    "the decoded signal itself) merge into voiced segments via "
    "relational gaps-and-islands (frame_idx - row_number). DuckDB "
    "cannot parse RIFF, so the oracle rebuilds the frame energies "
    "arithmetically (4r^2+2a^2 per sine period, round-half-up "
    "quantization — verified byte-exact against the codec) and runs "
    "the identical island merge. Payload bytes never shuffle; only "
    "(doc, frame, energy) rows leave the decode stage, and the "
    "windows partition by doc_id so segment assembly is one shuffle "
    "bounded by frame count, not audio bytes",
)
def q_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    frames = M.wav_frame_energy(M.synth_wav_bursty(docs))
    voiced = frames.filter(
        F.col("energy") >= 2 * F.col("peak") * F.col("peak")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    isl = voiced.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    seg = isl.groupBy("doc_id", "grp").agg(
        F.min("frame_idx").alias("start_frame"),
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("energy").alias("seg_energy"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_frame")
    return seg.select(
        "doc_id",
        F.row_number().over(w2).cast("bigint").alias("seg_idx"),
        F.col("start_frame").cast("bigint").alias("start_frame"),
        "n_frames",
        F.col("seg_energy").cast("bigint").alias("seg_energy"),
    )


@register(
    "gif_pipeline",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   8 + (doc_id % 24) AS w,
                   8 + (doc_id % 16) AS h
            FROM documents
        ), g AS (
            SELECT p.doc_id, p.w, p.h,
                   SUM((11 * gx.x + 5 * gy.y + 3 * p.doc_id) % 256)
                       AS total
            FROM p, range(0, 32) AS gx(x), range(0, 24) AS gy(y)
            WHERE gx.x < p.w AND gy.y < p.h
            GROUP BY p.doc_id, p.w, p.h
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(w * h AS BIGINT) AS n_pixels,
               round(CAST(total AS DOUBLE) / (w * h) + 1e-9, 6)
                   AS mean_pixel
        FROM g
    """,
    description="REAL image decode, fourth codec leg: per document a "
    "spec-conformant grayscale GIF87a is synthesized — LZW (GIF's "
    "actual compression layer) emitted as a genuine variable-width "
    "LSB-first code stream with dictionary growth and sub-block "
    "framing — then decoded back by a chunk-walking reader (real "
    "dictionary rebuild incl. the KwKwK case and the reader-side "
    "width off-by-one, palette and trailer validation) in a second "
    "Arrow-batched mapInPandas. Pixel(x,y) = (11x+5y+3*doc_id) % 256 "
    "is closed-form, so DuckDB recomputes the decoded mean pixel "
    "from a lateral range() grid without running LZW: the hash check "
    "proves the reconstructed bitmap is exact. Joins wav (RIFF/PCM), "
    "png (zlib), jpeg (T.81) and mjpeg-avi in the decode_real "
    "family; payload bytes never shuffle",
)
def q_gif_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = M.gif_decode(M.synth_gif(docs))
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        F.round(F.col("mean_pixel") + F.lit(1e-9), 6).alias("mean_pixel"),
    )
