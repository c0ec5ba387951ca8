"""Document deduplication operators for the training-data pipeline.

Scale-first designs over a `documents(doc_id, text, ...)` table:

* exact dedup       — hash-groupBy on a content digest (one shuffle on
                      the digest; map-side partial agg).
* MinHash + LSH     — shingle -> k minhashes -> band buckets ->
                      candidate pairs only within buckets (never O(n^2));
                      verify candidates with exact shingle Jaccard.
* prefix blocking   — n-gram Jaccard verified within cheap blocks.
* SimHash           — 32-bit signature from per-token digests; near-dup
                      = small Hamming distance within LSH-band blocks.

Cross-engine determinism: every hash is md5 hex (identical bytes in
Spark and DuckDB), minhash order is lexicographic on hex strings, and
SimHash bits derive from hex characters — so the DuckDB oracle can
re-derive signatures exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_ROWS = 2  # 8 hashes -> 4 bands of 2
SHINGLE_WIDTH = 3


def normalized_text(col: str = "text") -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(content_hash, group_size, keep_doc_id): hash-groupBy exact dedup.

    keep = min doc_id (deterministic survivor selection).
    """
    return (
        docs.select("doc_id", F.md5(normalized_text()).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").cast("int").alias("group_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def shingles(docs: DataFrame, width: int = SHINGLE_WIDTH) -> DataFrame:
    """(doc_id, shingle): word n-grams via sequence-positions explode.

    Stays in whole-stage codegen (no Python): split -> sequence ->
    explode -> concat of element_at slices.
    """
    toks = docs.select("doc_id", F.split(normalized_text(), " ").alias("ws"))
    toks = toks.filter(F.size("ws") >= width)
    pos = toks.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(1), F.size("ws") - (width - 1))).alias("i"),
    )
    parts = [F.element_at(F.col("ws"), F.col("i") + j) for j in range(width)]
    return pos.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(doc_id, i, mh): per-permutation minhash = lexicographic min of
    md5(i || ':' || shingle). The k permutations ride one explode —
    a single shuffle on (doc_id, i)."""
    hs = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
        F.col("shingle"),
    )
    return (
        hs.select(
            "doc_id",
            "i",
            F.md5(F.concat_ws(":", F.col("i").cast("string"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """(doc_a, doc_b): pairs sharing at least one LSH band bucket.

    Bucket join replaces the O(n^2) cross join; the self-join is on
    (band, bucket_key) with doc_a < doc_b, deduped across bands.
    """
    bands = (
        signatures.withColumn("band", (F.col("i") / F.lit(band_rows)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("mh")))).alias("bucket"))
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("bucket").alias("bucket_b")
    )
    return (
        a.join(b, (a["band"] == b["band_b"]) & (a["bucket"] == b["bucket_b"]))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def exact_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact shingle Jaccard for candidate pairs.

    Semi-joined to candidates first, so the shingle join only touches
    near-dup suspects.
    """
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle").distinct()
    sb = sh.select(F.col("doc_id").alias("_doc_b"), F.col("shingle").alias("shingle_b")).distinct()
    sizes = sa.groupBy("doc_a").agg(F.count("*").alias("n_a"))
    sizes_b = sb.groupBy(F.col("_doc_b").alias("doc_b")).agg(F.count("*").alias("n_b"))
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("_doc_b")) & (F.col("shingle") == F.col("shingle_b")), "inner")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes, "doc_a")
        .join(sizes_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    docs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    candidate -> exact-Jaccard verify -> threshold."""
    sh = shingles(docs)
    sig = minhash_signatures(sh, num_hashes)
    pairs = lsh_candidate_pairs(sig, band_rows)
    return exact_jaccard(sh, pairs).filter(F.col("jaccard") >= threshold)


def _prefix_key(n: int) -> F.Column:
    """First-n-token key with NULL-stable concatenation (missing tokens
    become '' so short docs key deterministically and identically to the
    DuckDB oracle's coalesce form)."""
    ws = F.split(normalized_text(), " ")
    parts: list[F.Column] = []
    for j in range(n):
        if j:
            parts.append(F.lit(" "))
        parts.append(F.coalesce(F.try_element_at(ws, F.lit(j + 1)), F.lit("")))
    return F.concat(*parts)


def prefix_block_jaccard(
    docs: DataFrame,
    prefix_tokens: int = 3,
    threshold: float = 0.5,
    max_block: int = 64,
    extended_tokens: int = 6,
) -> DataFrame:
    """n-gram Jaccard dedup with cheap prefix blocking (no MinHash):
    candidate pairs share their first ``prefix_tokens`` tokens.

    Skew guard: on natural text, boilerplate prefixes ("i think the")
    put millions of docs in one block, making within-block pair
    generation quadratic. Blocks with more than ``max_block`` members
    are re-keyed by a longer ``extended_tokens`` prefix (one extra
    small groupBy on the block key — never a pass over pairs). Pairs
    that differ inside the extended prefix are sacrificed: a documented
    recall trade, mirrored exactly by the oracle.
    """
    keyed0 = docs.select(
        "doc_id",
        _prefix_key(prefix_tokens).alias("block"),
        _prefix_key(extended_tokens).alias("block_ext"),
    )
    counts = keyed0.groupBy("block").agg(F.count("*").alias("_n"))
    keyed = keyed0.join(counts, "block").select(
        "doc_id",
        F.when(F.col("_n") > max_block, F.col("block_ext"))
        .otherwise(F.col("block"))
        .alias("block"),
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), "block")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("block").alias("block_b"))
    pairs = (
        a.join(b, (F.col("block") == F.col("block_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b")
    )
    return exact_jaccard(shingles(docs), pairs).filter(F.col("jaccard") >= threshold)


def simhash_signatures(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): bit-string SimHash.

    Bit j of a token = whether hex char j of md5(token) is >= '8'
    (i.e. top bit of that nibble); document bit j = majority vote over
    tokens. Hex-character derivation keeps the signature engine-portable.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("w")
    ).withColumn("h", F.md5("w"))
    bitrows = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("j"),
        F.col("h"),
    ).select(
        "doc_id",
        "j",
        F.when(
            F.substring(F.col("h"), F.col("j"), 1).isin(*"89abcdef"), F.lit(1)
        ).otherwise(F.lit(-1)).alias("v"),
    )
    per_bit = bitrows.groupBy("doc_id", "j").agg(F.sum("v").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("j"), (F.col("s") >= 0).cast("int").alias("b")))
                ),
                lambda x: x["b"].cast("string"),
            ),
        ).alias("simhash")
    )


def simhash_near_dups(
    docs: DataFrame, bits: int = 32, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming): SimHash near-dup pairs via Hamming-band
    candidate join — the scale path the round-1 docstring promised.

    Pigeonhole guarantee: two signatures within ``max_hamming`` bits
    differ in at most max_hamming bands, so with
    ``bands > max_hamming`` they MUST agree on at least one exact band —
    the band equi-join loses NO pairs under the threshold (no recall
    trade, unlike capped prefix blocking). Never an all-pairs join.
    """
    if bands <= max_hamming:
        raise ValueError("need bands > max_hamming for the pigeonhole guarantee")
    width = bits // bands
    sig = simhash_signatures(docs, bits)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.substring(F.col("simhash"), F.col("band") * width + 1, width).alias("bv"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "bv"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        F.col("band").alias("band_b"), F.col("bv").alias("bv_b"),
    )
    pairs = (
        a.join(b, (a["band"] == b["band_b"]) & (a["bv"] == b["bv_b"]))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("sig_a"), ""),
                F.split(F.col("sig_b"), ""),
                lambda x, y: x != y,
            ),
            lambda z: z,
        )
    )
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
