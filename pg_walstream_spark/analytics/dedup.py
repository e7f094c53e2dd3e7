"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Column expressions (JVM-side, codegen) — no Python
UDFs. Tokenization/shingling semantics are deliberately canonical (lower +
char-3-grams / ``[a-z0-9]+`` tokens, md5 hashing) so an external SQL engine
(DuckDB oracle) can reproduce results bit-for-bit.

Scale notes (100 TB corpus):
- exact: hash-groupBy with map-side partial agg — no skew risk.
- minhash-LSH: banding turns all-pairs O(n²) into per-bucket candidate
  join; band keys are md5-min strings, shuffle keys well distributed.
  k/bands tune recall.
- simhash: fixed-width bit signature; exact-signature buckets (hamming-0)
  keep it join-free; widen via multiple rotated bands if needed.
- n-gram jaccard: candidate pairs only (shingle-inverted-index join with
  frequency cap to bound hot shingles — the classic stop-shingle guard).
- embedding cosine: brute pairwise only for bounded n; LSH/IVF variants in
  similarity.py are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shingles(col: str = "text", n: int = 3):
    """Ordered char n-grams of lower(col) — matches the DuckDB oracle's
    range+substr definition. Guarded: texts shorter than n yield an empty
    array (Spark's sequence(1,0) would otherwise count DOWN)."""
    return F.expr(
        f"CASE WHEN length({col}) >= {n} THEN "
        f"transform(sequence(1, length(lower({col})) - {n - 1}),"
        f" i -> substr(lower({col}), i, {n})) "
        f"ELSE cast(array() as array<string>) END"
    )


def tokens(col: str = "text"):
    return F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one keeper (min id) per distinct
    content; n_copies counts the group. Map-side combine collapses hot
    hashes before the shuffle."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("content_md5", "keep_id", "n_copies")
    )


def minhash_signature(docs: DataFrame, k: int = 12, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """k min-wise hashes per doc: h_i = min over shingles of the first 15
    hex chars (60 bits) of md5(i || ':' || shingle), as a BIGINT.

    Each DISTINCT shingle is hashed once per function into a small
    dimension table, joined back, then min-aggregated: integer minima get
    a true HashAggregate with map-side combine, where min over md5 *hex
    strings* forced a SortAggregate over every (shingle row x k) value
    (~50 s vs ~2 s for k=128 over 850k shingle rows). The dimension table
    is broadcast — char-n-gram vocabularies are tiny (|alphabet|^n); for
    unbounded token-n-gram vocabularies swap the broadcast for a shuffle
    join on sh. Engine-portable: DuckDB reproduces the values with
    CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)."""
    ex = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("sh"),
    )
    dim = ex.select("sh").distinct().select(
        "sh",
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("sh"))), 1, 15
                ),
                16, 10,
            ).cast("long").alias(f"h{i}")
            for i in range(k)
        ],
    )
    return (
        ex.join(F.broadcast(dim), "sh")
        .groupBy(id_col)
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(k)])
    )


def minhash_lsh_pairs(docs: DataFrame, k: int = 12, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of k/bands rows;
    docs sharing any band key become a candidate pair (id_a < id_b)."""
    r = k // bands
    sig = minhash_signature(docs, k, text_col, id_col, n)
    # bands via ONE explode, not a per-band union: a union of b branches
    # re-evaluates the (k mins x shingles) signature aggregate b times, and
    # the candidate self-join doubles that again — 32 evaluations of the
    # most expensive subtree at k=128/b=16. Explode + persist makes it one.
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"h{b * r + j}") for j in range(r)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ])
    band_rows = (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bk"))
        .select(F.col(id_col), F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"))
        .persist()
    )
    a = band_rows.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    )
    bb = band_rows.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        a.join(bb, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """bits-wide simhash over word tokens: bit j = sign of Σ_tokens
    (bit_j(md5(token)) ? +1 : -1). Bits drawn from the first bits/4 hex
    chars of md5 — portable to the SQL oracle."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", F.md5("t"))
    bit_sums = []
    for j in range(bits):
        hex_pos = j // 4 + 1
        shift = j % 4
        bit = (
            F.shiftright(
                F.conv(F.substring("h", hex_pos, 1), 16, 10).cast("int"),
                shift,
            ).bitwiseAND(F.lit(1))
        )
        bit_sums.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_dup_groups(docs: DataFrame, bits: int = 16,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Hamming-0 near-dup groups: docs sharing an identical simhash."""
    return (
        simhash(docs, bits, text_col, id_col)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_pieces(docs: DataFrame, n_pieces: int = 4, piece_bits: int = 16,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash (by default) as ``n_pieces`` integer piece columns
    ``p0..p{n-1}`` of ``piece_bits`` bits each. Pieces, not one packed long:
    (a) bit 63 of a packed value would overflow a signed long, and (b) the
    pieces ARE the hamming-banding keys (see simhash_hamming_pairs), so
    storing them pre-split skips re-extraction at query time."""
    bits = n_pieces * piece_bits
    n_digits = (bits + 3) // 4
    # extract each hex digit ONCE in a projection (16 string ops per token)
    # instead of re-running substring+conv inside all 64 bit aggregates
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", F.md5("t")).select(
        F.col(id_col),
        *[
            F.conv(F.substring("h", d + 1, 1), 16, 10).cast("int")
            .alias(f"d{d}")
            for d in range(n_digits)
        ],
    )
    bit_sums = []
    for j in range(bits):
        bit = F.shiftright(F.col(f"d{j // 4}"), j % 4).bitwiseAND(F.lit(1))
        bit_sums.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = tok.groupBy(id_col).agg(*bit_sums)
    pieces = []
    for p in range(n_pieces):
        sig = None
        for j in range(piece_bits):
            jj = p * piece_bits + j
            term = F.when(F.col(f"s{jj}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        pieces.append(sig.cast("long").alias(f"p{p}"))
    return sums.select(F.col(id_col), *pieces)


def simhash_hamming_pairs(docs: DataFrame, max_hamming: int = 3,
                          n_pieces: int = 4, piece_bits: int = 16,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs within hamming distance ``max_hamming`` of the 64-bit
    simhash, via piece banding: by pigeonhole, two signatures at hamming
    distance < n_pieces must agree exactly on at least one piece — with 4
    pieces, any pair at hamming ≤ 3 shares ≥ 1 identical 16-bit piece — so
    max_hamming must stay < n_pieces for full recall. Candidates come from
    per-piece equality joins (join-key buckets, no all-pairs), then the
    exact hamming distance over all pieces verifies."""
    sig = simhash_pieces(docs, n_pieces, piece_bits, text_col, id_col)
    cand = None
    for p in range(n_pieces):
        a = sig.select(F.col(id_col).alias("id_a"),
                       F.col(f"p{p}").alias("pk"))
        b = sig.select(F.col(id_col).alias("id_b"),
                       F.col(f"p{p}").alias("pk"))
        one = (
            a.join(b, on="pk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = one if cand is None else cand.unionByName(one)
    cand = cand.distinct()
    sa = sig.select(F.col(id_col).alias("id_a"),
                    *[F.col(f"p{p}").alias(f"pa{p}") for p in range(n_pieces)])
    sb = sig.select(F.col(id_col).alias("id_b"),
                    *[F.col(f"p{p}").alias(f"pb{p}") for p in range(n_pieces)])
    ham = None
    for p in range(n_pieces):
        term = F.expr(f"bit_count(pa{p} ^ pb{p})")
        ham = term if ham is None else ham + term
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_shingle_freq: int = 1000) -> DataFrame:
    """All candidate pairs with char-n-gram Jaccard ≥ threshold.

    Inverted-index join on distinct shingles; shingles appearing in more
    than ``max_shingle_freq`` docs are dropped (stop-shingle guard) to
    bound the hot-key blowup at corpus scale."""
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("sh"),
    )
    freq_ok = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= max_shingle_freq
    )
    ex = ex.join(freq_ok.select("sh"), on="sh")
    # sizes AFTER the stop-shingle filter: Jaccard is defined over the
    # indexed (surviving) shingle space. Mixing filtered intersections with
    # unfiltered set sizes biases scores toward 0 for docs dominated by
    # corpus-common shingles — on a small-vocabulary corpus that zeroed out
    # even true 90%-prefix near-dups.
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), on="sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_lsh_pairs(docs: DataFrame, threshold: float = 0.65,
                            k: int = 128, bands: int = 16, n: int = 3,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Exact char-n-gram Jaccard over MinHash-LSH candidates — the
    scale path for n-gram dedup: banding bounds the candidate set (no
    all-pairs, no hot-shingle blowup), then each candidate pair is scored
    EXACTLY from the two docs' distinct-shingle sets. Recall is the LSH
    band recall: ≥99% for J ≥ 0.8 at k=128/bands=16 (r=8), degrading for
    pairs just above ``threshold``."""
    cand = minhash_lsh_pairs(docs, k=k, bands=bands,
                             text_col=text_col, id_col=id_col, n=n)
    sets = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(text_col, n)).alias("shs"),
    ).withColumn("sz", F.size("shs"))
    a = sets.select(F.col("id").alias("id_a"), F.col("shs").alias("shs_a"),
                    F.col("sz").alias("sz_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("shs").alias("shs_b"),
                    F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    # broadcast the shingle-set side: shipping the (candidate x two
    # ~n_shingles arrays) through a shuffle costs GBs where the per-doc set
    # table is MBs. At corpus sizes past broadcast range, swap for a
    # bucketed join of candidates against sets partitioned by doc id.
    return (
        cand.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def embedding_near_dups(emb: DataFrame, threshold: float = 0.98,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Brute pairwise cosine near-dups (id_a < id_b, cos ≥ threshold).
    Baseline path; bounded-n only — use similarity.ann_* for scale."""
    as_double = F.transform(vec_col, lambda x: x.cast("double"))
    withn = emb.select(
        F.col(id_col), as_double.alias(vec_col),
        F.sqrt(F.aggregate(
            F.transform(as_double, lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x,
        )).alias("_norm"),
    )
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("_norm").alias("na"),
    )
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("_norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
