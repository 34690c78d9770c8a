"""Deduplication operators for LLM training-data pipelines.

Five dedup families over a document corpus, each built from JVM-side
Catalyst expressions (no Python in the hot path) so a 100 TB corpus runs at
scan speed plus exactly the shuffles listed per-operator:

* **exact** — hash-groupBy on content digest; one shuffle keyed by digest.
* **MinHash + LSH** — shingle -> salted-md5 minhash signature -> banded
  bucket join -> Jaccard verification. Candidate generation is a
  self-join co-partitioned on band hash, so pair cost is O(sum of
  bucket^2), not O(n^2).
* **SimHash** — bitwise-majority token-hash signature; near-dup candidates
  share a signature band; verification is exact Hamming distance.
* **n-gram Jaccard** — exact pairwise Jaccard via an inverted shingle
  index (explode + co-partitioned join), with a document-frequency cap to
  drop stop-shingles (the classic skew guard: a shingle appearing in k
  docs produces k^2 join rows).
* **embedding cosine** — see similarity.py (sign-LSH bucketed near-dup).

Everything is deterministic: hashes are md5 (identical across engines),
min/argmax ties break on doc id, and float math is integer-ratio division
only — which is why every operator here has an exact DuckDB oracle in
flux_spark/llm/queries.py.

Reference: tferdous17/flux has no dedup surface (SURVEY.md §2.7); these are
the BASELINE.json north-star additions. The only reference-adjacent piece is
content hashing, cf. MurmurHash2.java:12-59 (we use md5 for cross-engine
parity rather than murmur2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles; short docs (<k tokens) contribute
    the whole text as one shingle — Arrow-vectorized production form
    (the Catalyst expression form, :func:`word_shingles_catalyst`, stays
    as the pinned reference the DuckDB oracle mirrors).

    The transform/concat_ws gram builder is CodegenFallback like the
    other shingle-family expressions, and shingle construction runs at
    full corpus volume, so it set the scan-cost floor of every dedup
    operator (~2.8 s of the sf0.1 LSH pipeline) — plain Python string
    slicing over Arrow batches is ~10x cheaper. Split semantics match
    Spark's ``split(text, " ")`` exactly: single-space separator, empty
    strings preserved (Python ``str.split(" ")``, not ``str.split()``);
    distinct preserves first-occurrence order like ``array_distinct``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sh(col):
        import pandas as pd

        out = []
        for text in col:
            if text is None:
                # Catalyst split/transform null-propagate; match them
                out.append(None)
                continue
            toks = text.split(" ")
            if len(toks) < k:
                out.append([text])
            else:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k])
                            for i in range(len(toks) - k + 1)
                        )
                    )
                )
        return pd.Series(out)

    return _sh(F.col(text_col))


def word_shingles_catalyst(text_col: str = "text", k: int = 3) -> Column:
    """Pure-Catalyst reference form of :func:`word_shingles`; tests pin
    the Arrow kernel against it on every text shape."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(
        F.when(n < k, F.array(F.col(text_col))).otherwise(grams)
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical content by digest; canonical id = min id per group.

    One shuffle keyed on the 128-bit digest (not the text itself), so
    shuffle volume at 100 TB is ~16 B/doc + ids regardless of doc size.
    Returns (canonical_id, n_copies).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("__digest"), F.col(id_col))
        .groupBy("__digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (min id) per distinct content value."""
    w_ids = df.select(F.md5(F.col(text_col)).alias("__digest"), F.col(id_col))
    keep = w_ids.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_MOD32 = 4_294_967_296  # 2^32


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: element i is the numeric MIN over shingles of
    ``(h1 + i*h2) mod 2^32``, where (h1, h2) are the first and third
    32-bit words of md5(shingle).

    The classic two-hash construction (Kirsch & Mitzenmacher) yields
    ``num_hashes`` independent-enough hash functions from ONE md5 per
    shingle — 16x less hashing than salting md5 per function, which makes
    signature computation scan-bound at corpus scale. md5 is bit-identical
    in every engine and the derived arithmetic is exact int64, which buys
    an exact SQL oracle — a property murmur-based minhash can't give us.
    (h1 + 15*h2 < 2^36, so the arithmetic never overflows int64.)
    """
    hs = F.transform(shingles, F.md5)
    pairs = F.transform(
        hs,
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 17, 8), 16, 10).cast("long").alias("h2"),
        ),
    )

    def hash_i(i: int):
        # MUST stay a single-arg lambda: F.transform passes the element
        # *index* as a second argument, which would clobber the captured i
        return lambda p: (p["h1"] + F.lit(i) * p["h2"]) % F.lit(_MOD32)

    return F.array(
        *[
            F.array_min(F.transform(pairs, hash_i(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_signature_arrow(shingles: Column, num_hashes: int = 16) -> Column:
    """Arrow-vectorized twin of :func:`minhash_signature` — bit-identical
    output (same md5 words, same int64 arithmetic, same mins), without the
    interpreter cost: Catalyst higher-order array functions are
    CodegenFallback, and the Catalyst form evaluates 2 + num_hashes
    interpreted transform passes per row (~18 us/shingle measured — 5+ s
    for a 287k-shingle corpus at sf0.1). Here one hashlib.md5 per shingle
    feeds a numpy min over the two-hash family, so signature cost drops to
    the hashing itself and parallelizes with the scan.

    The Catalyst form remains the reference implementation (and the shape
    the DuckDB oracle mirrors); tests pin this UDF against it on every
    shingle-set shape. Same rule as :func:`similarity.pair_cosine_arrow`:
    whenever a per-element expression family is CodegenFallback, Arrow
    wins even at O(corpus) volume once there are O(10+) passes.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _sig(col):
        import hashlib

        import numpy as np
        import pandas as pd

        out = []
        for lst in col:
            if lst is None:
                # match the Catalyst tower exactly: transform(NULL) makes
                # each array_min NULL, but the outer F.array still builds
                # -> an array of NULL elements, not a NULL array
                out.append([None] * num_hashes)
                continue
            n = len(lst)
            if n == 0:
                # array_min over empty -> NULL elements, matching Catalyst
                out.append([None] * num_hashes)
                continue
            h1 = np.empty(n, dtype=np.int64)
            h2 = np.empty(n, dtype=np.int64)
            for j, s in enumerate(lst):
                d = hashlib.md5(s.encode("utf-8")).digest()
                # md5 hex chars 1-8 = bytes 0-4 (h1), chars 17-24 = bytes
                # 8-12 (h2) — the same two 32-bit words as the Catalyst form
                h1[j] = int.from_bytes(d[0:4], "big")
                h2[j] = int.from_bytes(d[8:12], "big")
            # h1 + 15*h2 < 2^36: exact in int64, same modulus arithmetic
            out.append(
                [int(((h1 + i * h2) % _MOD32).min()) for i in range(num_hashes)]
            )
        return pd.Series(out)

    return _sig(shingles)


def lsh_band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: band b's bucket key is md5 over its `rows`
    consecutive minhashes (stringified). Docs agreeing on any band become
    candidates."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.slice(signature, b * rows + 1, rows),
                        lambda v: v.cast("string"),
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def auto_band_rows(corpus_size: int, small: int = 4096) -> int:
    """Rows-per-band for MinHash-LSH derived from the corpus size — the
    banding twin of :func:`similarity.auto_planes`.

    A band of ``r`` rows admits a pair as a candidate with probability
    ``s^r`` (s = true Jaccard), so candidate volume across the corpus is
    ``bands * sum_pairs s^r`` — at a FIXED r it grows with the square of
    the duplicate mass (the measured sf10 wall: 54 s at the gate's 4-row
    bands). Stepping r from 4 to 8 multiplies every band's false-candidate
    rate by ``s^4`` (0.0625 at s = 0.5), which converts the quadratic tail
    back to output-bound work, at the cost of raising the S-curve midpoint
    from (1/4)^(1/4) ~ 0.71 to (1/2)^(1/8) ~ 0.92 — the right trade on
    duplicate-heavy corpora where the mass being hunted is near-exact.
    Beyond that, production scaling grows ``num_hashes`` with log(n) so
    both recall and selectivity can be held; that knob is deliberately NOT
    auto-derived here because the DuckDB oracle materializes the signature
    construction statically (16 hashes), and a gate whose oracle cannot
    re-derive it would be weaker, not stronger.
    """
    return 4 if corpus_size <= small else 8


def auto_max_doc_freq(corpus_size: int, floor: int = 16) -> int:
    """Shingle document-frequency cap for the inverted-index pair
    enumerators (:func:`containment_pairs` / :func:`ngram_jaccard_pairs`)
    derived from the corpus size — the winnowing prefilter promoted to a
    measured knob (r11, VERDICT r10 #6).

    Why a df cap bounds the quadratic: a shingle shared by df documents
    admits df·(df−1)/2 candidate pairs, and total candidate volume is
    Σ df² over surviving shingles ≤ cap · Σ df = cap · (total shingle
    instances) — LINEAR in the corpus for a bounded cap, where the
    unfiltered enumeration is output-bound (quadratic) on duplicate-heavy
    corpora (the documented SCALE.md law). A shingle in more than ~a few
    dozen documents is boilerplate (navigation chrome, license headers,
    the synthetic corpus's 30-word vocabulary) and carries no containment
    signal the rare shingles don't; ``2·ceil(log2 n)`` grows the cap
    gently with corpus size so mid-frequency shingles keep their recall
    at small n (floor 16) without re-admitting the quadratic at large n
    (500k docs → 38, 1B → 60). Re-derivable in SQL from COUNT(*) — the
    doc_containment_auto gate pins exactly that."""
    return max(floor, 2 * math.ceil(math.log2(max(2, corpus_size))))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH with exact Jaccard verification.

    Plan shape (the part that matters at 100 TB):
      1. one narrow pass computes shingles + signature + band hashes
         (no shuffle, column-pruned to (id, text));
      2. candidate generation: posexplode bands, self-join co-partitioned
         on (band_id, band_hash) — pair cost is sum over buckets of
         |bucket|^2, the LSH payoff;
      3. `max_bucket_size` drops degenerate buckets (boilerplate shingles
         produce mega-buckets; at k docs a bucket costs k^2 join rows —
         the standard skew guard, off by default for oracle parity);
      4. verification: inverted-index join on shared shingles counts the
         intersection; Jaccard = |A∩B| / (|A|+|B|-|A∩B|) as exact integer
         division in double.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    ``id_col`` values MUST be unique: a duplicated id merges two
    documents' shingle sets in the verification join, so the intersection
    count can exceed either set size and |A|+|B|-|A∩B| can reach zero
    (surfaces as an ANSI DIVIDE_BY_ZERO — exactly how a colliding
    id-offset scheme in the gate corpus was caught at sf3).
    """
    rows = num_hashes // bands
    # Persist the shingle and band tables: each feeds both sides of a
    # self-join (and the verification join), and recomputing the 16-way
    # md5 minhash per branch dominates runtime otherwise. At warehouse
    # scale this is "materialize the signature table once" — the standard
    # production shape for LSH dedup.
    sh = (
        df.select(F.col(id_col), word_shingles(text_col, k).alias("__shingles"))
        .withColumn("__n_sh", F.size("__shingles"))
        .persist()
    )
    sig = sh.withColumn(
        "__sig", minhash_signature_arrow(F.col("__shingles"), num_hashes)
    )
    banded = sig.select(
        id_col,
        F.posexplode(lsh_band_hashes(F.col("__sig"), bands, rows)).alias(
            "__band", "__bhash"
        ),
    ).persist()
    if max_bucket_size is not None:
        from pyspark.sql import Window

        cnt = Window.partitionBy("__band", "__bhash")
        banded = banded.withColumn("__bn", F.count("*").over(cnt)).where(
            F.col("__bn") <= max_bucket_size
        ).drop("__bn")

    a = banded.alias("a")
    b = banded.alias("b")
    # SHUFFLE_HASH: both sides scale with the corpus, and the static
    # planner's size estimates for cached/derived relations are unreliable
    # enough to pick a broadcast that cannot be built at 100x data (the
    # sf10 ladder run failed exactly there); shuffled hash join is the
    # strategy that is correct at every scale for these bucket joins.
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bhash") == F.col("b.__bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    # Verification (r13, guide §2.3): fetch each candidate's DISTINCT
    # shingle ARRAY via two id-equi-joins and intersect per pair in one
    # codegen'd projection (size(array_intersect)) — the former
    # inverted-index form exploded the corpus to (id, shingle) rows,
    # shuffled it twice (hash by id_a + sort by (id_b, shingle)) and then
    # aggregated |pairs| x |intersection| expanded rows, the largest
    # intermediate in the plan. The arrays are distinct-element by
    # construction, so size(array_intersect) is the identical exact
    # intersection count. join1 builds on the narrow candidate pairs
    # (shuffled hash, ~16 B/row); join2's corpus side is kept sort-merge,
    # which spills instead of OOMing (the old eb posture — broadcast off
    # bogus cached-relation stats cannot be built at 100x).
    sha = sh.select(
        F.col(id_col).alias("id_a"),
        F.col("__n_sh").alias("__na"),
        F.col("__shingles").alias("__sa"),
    )
    shb = sh.select(
        F.col(id_col).alias("id_b"),
        F.col("__n_sh").alias("__nb"),
        F.col("__shingles").alias("__sb"),
    )
    common = (
        cand.hint("shuffle_hash")
        .join(sha, "id_a")
        .join(shb.hint("merge"), "id_b")
        .select(
            "id_a",
            "id_b",
            "__na",
            "__nb",
            F.size(F.array_intersect("__sa", "__sb")).alias("__common"),
        )
    )
    jac = F.col("__common").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    return (
        common.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_collapse(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Per-document survivor output of MinHash-LSH dedup — the SCALE form
    of :func:`minhash_lsh_pairs` (r12, VERDICT r11 #4).

    Pair ENUMERATION is output-bound on duplicate-heavy corpora: d exact
    copies of one document alone emit d(d-1)/2 verified pairs, so the
    r9 output-bound law makes the pair form quadratic no matter how the
    candidates are admitted (the three recorded sf100 wall skips). What
    a curation pipeline actually consumes is one verdict per document —
    this operator emits exactly that, in linear output:

    1. exact dedup FIRST: one shuffle keyed on the 128-bit content
       digest (16 B/doc regardless of doc size) collapses identical
       texts onto their min-id canonical — the duplicate mass LSH would
       otherwise re-discover pair-by-pair never reaches the bucket join;
    2. MinHash-LSH (same signature/banding/verification as the pair
       form, ``max_bucket_size`` skew guard ON by default — the
       production posture doc_curation_pipeline uses) runs over
       CANONICALS only;
    3. greedy min-id survivor rule: a canonical with a verified
       lower-id near-dup collapses onto the smallest such id.

    Returns one row per input document:
    (id, dup_of, reason 'exact'|'near'|NULL, is_kept). The pair form
    stays correctness-gated at sf0.01; this is what the bench headline
    times at scale (same precedent as the auto-banded/auto-plane twins).

    .. note:: ``dup_of`` is the GREEDY parent, not necessarily a kept
       row: an exact duplicate collapses onto its content canonical,
       but that canonical may itself have near-collapsed onto a lower
       id (and near chains B->A, C->B likewise). Consumers that need
       the surviving representative must chain-follow ``dup_of`` until
       an ``is_kept`` row (bounded: every hop strictly decreases the
       id), or run one connected-components pass over the
       (id, dup_of) edges. Emitting the greedy parent is deliberate —
       it is one groupBy per document, preserves WHY each doc was
       dropped (reason column pairs with the direct parent), and the
       SQL oracle replays the identical rule; transitive resolution is
       an iterative join whose depth is data-dependent, which would
       make the operator's cost unbounded on adversarial chains.
    """
    from pyspark.sql import Window

    # r13 (guide §8/§2.3): decide exact-dedup on NARROW rows and move
    # the text once. The old form ran the min-id window over
    # (id, text, digest) rows and re-executed that scan + full-text
    # shuffle for each of its three consumers (exact_out, surv, kept).
    # Now the window sees only (id, 16-byte digest); the resulting
    # (id, canon) map is checkpointed (8+8 bytes/doc), every verdict
    # leg reads it, and the only corpus-width movement left is the one
    # survivor semi-join feeding the LSH signature build.
    w = Window.partitionBy("__digest")
    canon_map = (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__digest"))
        .withColumn("__canon", F.min(id_col).over(w))
        .select(id_col, "__canon")
        .localCheckpoint(eager=True)
    )
    exact_out = canon_map.where(F.col(id_col) != F.col("__canon")).select(
        F.col(id_col),
        F.col("__canon").alias("dup_of"),
        F.lit("exact").alias("reason"),
    )
    surv_ids = canon_map.where(F.col(id_col) == F.col("__canon")).select(
        id_col
    )
    surv = df.select(id_col, text_col).join(
        surv_ids.hint("shuffle_hash"), id_col
    )
    pairs = minhash_lsh_pairs(
        surv,
        text_col=text_col,
        id_col=id_col,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )
    near = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("dup_of")
    )
    near_out = near.select(
        F.col(id_col), F.col("dup_of"), F.lit("near").alias("reason")
    )
    kept = surv_ids.join(near, id_col, "left_anti").select(
        F.col(id_col),
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("string").alias("reason"),
    )
    return (
        exact_out.unionByName(near_out)
        .unionByName(kept)
        .withColumn("is_kept", F.col("dup_of").isNull())
    )


def minhash_jaccard_estimate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Estimated vs exact Jaccard for every LSH candidate pair — the
    calibration view of the MinHash sketch.

    est_jaccard = fraction of agreeing signature positions (the unbiased
    MinHash estimator); jaccard = exact intersection-over-union from the
    inverted shingle index. Shipping both lets a pipeline measure sketch
    error on its own corpus before trusting estimate-only dedup at scales
    where exact verification is unaffordable. Same plan shape as
    minhash_lsh_pairs; the extra cost is one 16-element zip per pair.
    """
    rows = num_hashes // bands
    sh = (
        df.select(F.col(id_col), word_shingles(text_col, k).alias("__shingles"))
        .withColumn("__n_sh", F.size("__shingles"))
        .persist()
    )
    sig = sh.withColumn(
        "__sig", minhash_signature_arrow(F.col("__shingles"), num_hashes)
    ).persist()
    banded = sig.select(
        id_col,
        F.posexplode(lsh_band_hashes(F.col("__sig"), bands, rows)).alias(
            "__band", "__bhash"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bhash") == F.col("b.__bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sa"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sb"))
    matches = F.size(
        F.filter(
            F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda v: v
        )
    )
    est = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias(
            "est_jaccard"
        ),
    )
    ex = sh.select(id_col, "__n_sh", F.explode("__shingles").alias("__s"))
    ea = ex.select(
        F.col(id_col).alias("id_a"), F.col("__n_sh").alias("__na"), "__s"
    )
    eb = ex.select(
        F.col(id_col).alias("id_b"), F.col("__n_sh").alias("__nb"), "__s"
    )
    common = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "__s"])
        .groupBy("id_a", "id_b", "__na", "__nb")
        .agg(F.count("*").alias("__common"))
    )
    jac = F.col("__common").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    exact = common.select("id_a", "id_b", jac.alias("jaccard"))
    # left join: banded candidates with zero shared shingles keep jaccard 0
    return est.join(exact, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "est_jaccard",
        F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard via an inverted shingle index.

    No LSH approximation: every pair sharing >= 1 (rare-enough) shingle is
    scored. `max_doc_freq` prunes shingles appearing in more than that many
    docs — both a skew guard (a df-k shingle emits k^2 pair rows) and the
    reason this stays tractable: near-dup pairs share *rare* shingles.
    Note the Jaccard denominator still uses the full shingle-set sizes, so
    scores are exact; only candidate *recall* depends on the cap.
    """
    sh = df.select(
        F.col(id_col), word_shingles(text_col, k).alias("__shingles")
    ).withColumn("__n_sh", F.size("__shingles"))
    # persisted: both sides of the pair join read this inverted index
    ex = sh.select(id_col, "__n_sh", F.explode("__shingles").alias("__s")).persist()
    if max_doc_freq is not None:
        rare = (
            ex.groupBy("__s")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("__s")
        )
        ex = ex.join(rare, "__s")
    ea = ex.select(F.col(id_col).alias("id_a"), F.col("__n_sh").alias("__na"), "__s")
    eb = ex.select(F.col(id_col).alias("id_b"), F.col("__n_sh").alias("__nb"), "__s")
    common = (
        ea.join(eb.hint("merge"), "__s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__na", "__nb")
        .agg(F.count("*").alias("__common"))
    )
    jac = F.col("__common").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    return (
        common.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle containment C(A in B) = |A∩B| / |A| — the
    subset/quote detector Jaccard structurally misses: a short document
    wholly embedded in a long one has Jaccard ~ |A|/|B| (arbitrarily
    small) but containment 1.0. This is the signal for "doc is a quoted
    excerpt / boilerplate-wrapped copy / partial scrape of another" in a
    curation pipeline, where the usual action is dropping the contained
    side rather than either-of-the-pair.

    Same inverted-shingle-index plan as :func:`ngram_jaccard_pairs`
    (exact intersections via merge-hinted equi-join on shared shingles,
    ``max_doc_freq`` as the skew/df guard); scores both directions and
    keeps pairs where either containment >= threshold. Returns
    (id_a, id_b, containment_a_in_b, containment_b_in_a, jaccard) with
    id_a < id_b.
    """
    sh = df.select(
        F.col(id_col), word_shingles(text_col, k).alias("__shingles")
    ).withColumn("__n_sh", F.size("__shingles"))
    ex = sh.select(id_col, "__n_sh", F.explode("__shingles").alias("__s"))
    if max_doc_freq is not None:
        # Capped path (r13, guide §2.3/§2.4): the df cap bounds every
        # shingle bucket at max_doc_freq docs, so the pairs expand
        # IN-ARRAY from one groupBy on the shingle — replacing the old
        # persist + df-groupBy + df-join + sort-merge self-join chain
        # (four wide stages, index shuffled twice) with groupBy + two
        # generates + the pair aggregate (same expansion as
        # operators.pairs_from_basket). The size filter IS the df
        # filter: the index holds one row per (doc, distinct shingle).
        # Pair set and counts are identical — array_sort orders each
        # bucket by doc_id, and anchor-before-suffix enumeration is
        # exactly the join form's id_a < id_b. The uncapped path keeps
        # the join form: one hot shingle there would collect an
        # unbounded bucket into a single row/task.
        buckets = (
            ex.groupBy("__s")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), F.col("__n_sh")))
                ).alias("__ds")
            )
            .where(F.size("__ds") <= max_doc_freq)
        )
        anchors = buckets.select(
            "__ds", F.posexplode("__ds").alias("__pos", "__a")
        )
        common = (
            anchors.select(
                F.col("__a")[id_col].alias("id_a"),
                F.col("__a.__n_sh").alias("__na"),
                F.explode(
                    F.expr("slice(__ds, __pos + 2, size(__ds) - __pos - 1)")
                ).alias("__b"),
            )
            .select(
                "id_a",
                "__na",
                F.col("__b")[id_col].alias("id_b"),
                F.col("__b.__n_sh").alias("__nb"),
            )
            .groupBy("id_a", "id_b", "__na", "__nb")
            .agg(F.count("*").alias("__common"))
        )
    else:
        ex = ex.persist()
        ea = ex.select(
            F.col(id_col).alias("id_a"), F.col("__n_sh").alias("__na"), "__s"
        )
        eb = ex.select(
            F.col(id_col).alias("id_b"), F.col("__n_sh").alias("__nb"), "__s"
        )
        common = (
            ea.join(eb.hint("merge"), "__s")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "__na", "__nb")
            .agg(F.count("*").alias("__common"))
        )
    c_ab = F.col("__common").cast("double") / F.col("__na")
    c_ba = F.col("__common").cast("double") / F.col("__nb")
    jac = F.col("__common").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    return (
        common.select(
            "id_a",
            "id_b",
            c_ab.alias("containment_a_in_b"),
            c_ba.alias("containment_b_in_a"),
            jac.alias("jaccard"),
        )
        .where(
            F.greatest("containment_a_in_b", "containment_b_in_a")
            >= threshold
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
    k: int = 3,
) -> DataFrame:
    """n_bits-wide SimHash over distinct word k-gram shingles.

    Bit j of a feature's hash is bit (j%4) of hex digit (j//4) of
    md5(shingle); the document bit is the majority vote across features
    (count of ones doubled > feature count; ties resolve to bit 0 —
    deterministic, mirrored exactly in the SQL oracle). Shingles (not bare
    tokens) are the features so that documents over a small vocabulary
    still hash distinctively.

    Computed entirely per-row with higher-order array functions: the
    shingle array folds into an n_bits-wide one-bit-count accumulator via
    ``aggregate``/``zip_with`` — ZERO shuffles and no explode (an earlier
    explode + n_bits-column groupBy-sum form cost one shuffle and ~3x the
    wall time). Each document computes its own signature inside one
    codegen'd projection, so the operator scales with scan bandwidth at
    100 TB. The first n_bits/4 hex digits of md5 decode to one bigint via
    ``conv``; the hex-digit bit layout maps to bit (4*(D-1) - j + 2*(j%4))
    of that integer (digit 0 is most significant).
    """
    assert n_bits % 4 == 0 and n_bits <= 32
    sh = df.select(F.col(id_col), word_shingles(text_col, k).alias("__sh"))
    return sh.select(
        F.col(id_col), simhash_bits_arrow(F.col("__sh"), n_bits).alias("simhash")
    )


def simhash_catalyst(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
    k: int = 3,
) -> DataFrame:
    """Pure-Catalyst reference form of :func:`simhash` (the shape the
    DuckDB oracle mirrors; tests pin the Arrow kernel against it).
    ``aggregate``/``zip_with`` here are CodegenFallback, which is why the
    production path is the Arrow kernel — n_bits interpreted lambda evals
    per shingle add up at scan volume."""
    assert n_bits % 4 == 0 and n_bits <= 32
    d = n_bits // 4  # hex digits used; conv(8 hex) fits signed 64-bit
    sh = df.select(F.col(id_col), word_shingles(text_col, k).alias("__sh"))
    xs = F.expr(
        f"transform(__sh, s -> cast(conv(substring(md5(s),1,{d}),16,10) as bigint))"
    )
    ones = F.expr(
        f"aggregate(__xs, array_repeat(0L, {n_bits}), (acc, x) -> "
        f"zip_with(acc, transform(sequence(0,{n_bits - 1}), "
        f"j -> shiftright(x, {4 * (d - 1)} - j + 2*(j%4)) & 1L), (a,b) -> a+b))"
    )
    withc = sh.select(
        F.col(id_col), F.size("__sh").alias("__n"), xs.alias("__xs")
    ).select(id_col, "__n", ones.alias("__c"))
    sim = None
    for j in range(n_bits):
        bit = (F.element_at("__c", j + 1) * 2 > F.col("__n")).cast("long") * F.lit(2**j)
        sim = bit if sim is None else sim + bit
    return withc.select(F.col(id_col), sim.alias("simhash"))


def simhash_bits_arrow(shingles: Column, n_bits: int = 32) -> Column:
    """Arrow-vectorized SimHash kernel, bit-identical to the
    :func:`simhash_catalyst` expression form: same md5 hex-digit bit
    layout (bit j = bit ``4*(d-1) - j + 2*(j%4)`` of the first ``d`` hex
    digits as an integer), same majority rule (2*ones > n, ties -> 0).
    Bit counting is an integer sum — order-independent — so exactness is
    structural, not fold-order-dependent. One hashlib.md5 per shingle
    plus numpy bit math replaces n_bits interpreted zip_with passes
    (the same CodegenFallback tax as the MinHash signature)."""
    from pyspark.sql.functions import pandas_udf

    d = n_bits // 4

    @pandas_udf("long")
    def _sim(col):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.array(
            [4 * (d - 1) - j + 2 * (j % 4) for j in range(n_bits)],
            dtype=np.int64,
        )
        weights = np.array([1 << j for j in range(n_bits)], dtype=np.int64)
        out = [None] * len(col)
        for r, lst in enumerate(col):
            if lst is None:
                # Catalyst zip_with/aggregate null-propagate
                continue
            n = len(lst)
            xs = np.empty(n, dtype=np.int64)
            for i, s in enumerate(lst):
                xs[i] = int(
                    hashlib.md5(s.encode("utf-8")).hexdigest()[:d], 16
                )
            ones = ((xs[:, None] >> shifts[None, :]) & 1).sum(axis=0)
            out[r] = int((((ones * 2) > n) * weights).sum())
        return pd.Series(out, dtype="object")

    return _sim(shingles)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs whose SimHashes differ in <= max_hamming bits.

    Candidates: split the signature into `bands` equal bit-slices; a pair
    with Hamming distance <= bands-1 must agree exactly on >= 1 slice
    (pigeonhole), so bucketing on (band_id, slice_value) finds all such
    pairs with a co-partitioned self-join. Verification computes exact
    Hamming distance with integer bit arithmetic (codegen, no UDF).
    """
    width = n_bits // bands
    s = simhash(df, text_col, id_col, n_bits).persist()
    slices = F.array(
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(
                F.lit(2**width - 1)
            )
            for b in range(bands)
        ]
    )
    banded = s.select(
        id_col, "simhash", F.posexplode(slices).alias("__band", "__sl")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__sl") == F.col("b.__sl"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__ha"),
            F.col("b.simhash").alias("__hb"),
        )
        .distinct()
    )
    # popcount(xor) via shift/AND — one xor then n_bits single-bit adds;
    # values identical to the former per-bit division form.
    x = F.col("__ha").bitwiseXOR(F.col("__hb"))
    ham = None
    for j in range(n_bits):
        d = F.shiftright(x, j).bitwiseAND(F.lit(1))
        ham = d if ham is None else ham + d
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve pairwise near-dup edges into transitive duplicate clusters.

    Iterative min-label propagation: every vertex starts labeled with its
    own id; each round a vertex takes the min label over itself and its
    neighbors; fixpoint = connected components, cluster_id = min vertex id
    in the component (matching the canonical-id convention of
    exact_dedup_groups).

    Scale shape: each round is one co-partitioned join (edges x labels,
    both keyed on vertex id) + one min-groupBy — no driver-side data, the
    only collect is a 1-row SUM(label) used as the convergence test (the
    label vector is non-increasing, so an unchanged sum IS the fixpoint).
    Rounds needed = graph diameter; dedup graphs are near-cliques with
    tiny diameter, so 2-4 rounds in practice. For adversarial
    long-chain graphs swap in large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce"), same interface.

    If ``vertices`` (a 1-column DataFrame of ids) is given, isolated ids
    appear in the output as their own singleton cluster.
    Returns (doc_id, cluster_id).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # localCheckpoint (not persist) on the iteration state: it truncates the
    # logical plan, so round N's analysis cost is O(1) instead of O(N) —
    # without it Catalyst re-analyzes a lineage that grows one
    # join+union+agg deeper every round and planning time dominates.
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        by_dst = labels.select(F.col("id").alias("dst"), "comp")
        prop = sym.join(by_dst, "dst").select(F.col("src"), "comp")
        new_labels = (
            prop.unionByName(labels.select(F.col("id").alias("src"), "comp"))
            .groupBy("src")
            .agg(F.min("comp").alias("comp"))
            .select(F.col("src").alias("id"), "comp")
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    out = labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    if vertices is not None:
        vcol = vertices.columns[0]
        v = vertices.select(F.col(vcol).alias("doc_id")).distinct()
        out = v.join(out, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    return out


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, how many of
    its distinct word k-grams appear anywhere in the benchmark set.

    The benchmark's distinct shingle set is tiny relative to the corpus
    (eval sets are MBs, corpora are TBs), so it is broadcast — the corpus
    side never shuffles: scan -> explode -> broadcast semi-ish join ->
    re-aggregate on the already-partitioned doc id. Returns only
    contaminated docs (n_contaminated >= 1) with their overlap rate; the
    standard pre-training decontamination pass (e.g. GPT-3 appendix C)."""
    from pyspark.sql.functions import broadcast

    bench_sh = (
        benchmark.select(F.explode(word_shingles(text_col, k)).alias("__sh"))
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col), word_shingles(text_col, k).alias("__shs")
    ).select(
        id_col,
        F.size("__shs").cast("long").alias("n_shingles"),
        F.explode("__shs").alias("__sh"),
    )
    hits = corpus_sh.join(broadcast(bench_sh), "__sh")
    return (
        hits.groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double") / F.col("n_shingles")
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicate-span removal (substring dedup)
# ---------------------------------------------------------------------------

def dup_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Remove corpus-wide duplicated token spans from every document —
    the exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed relationally: a
    token is dropped iff it lies inside any token ``k``-gram that occurs
    in >= ``min_docs`` distinct documents. (The paper's suffix array
    finds byte-level spans; corpus-wide duplicated k-grams are the
    classic scalable approximation — e.g. what C4-style pipelines hash.)

    Plan shape, scan-scale at 100 TB: one posexplode producing n-k+1
    grams per doc (array ops, no UDF), one shuffled groupBy on the gram
    to find duplicates (map-side partial counts collapse the long tail —
    most grams are unique), then a join of grams against the (small)
    duplicate set — AQE broadcasts it in the common case — and a
    left-anti join to drop covered token positions. Reassembly is a
    sorted-struct collect per doc: deterministic, no window.

    Returns (id, clean_text, n_tokens, n_kept_tokens); a fully-duplicated
    document survives as an empty string (curation pipelines filter on
    ``n_kept_tokens`` downstream).
    """
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
    grams = toks.select(
        id_col,
        F.posexplode(
            # sequence(1, 0) counts DOWN in Spark, so guard short docs
            # with an explicit empty-array branch instead of greatest()
            F.expr(
                f"if(size(__t) >= {k}, "
                f"transform(sequence(1, size(__t)-{k}+1), "
                f"i -> array_join(slice(__t, i, {k}), ' ')), "
                f"array())"
            )
        ).alias("__gp", "__gram"),
    )
    dup = (
        grams.groupBy("__gram")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__gram")
    )
    covered = (
        grams.join(dup, "__gram")
        .select(
            id_col,
            F.explode(F.expr(f"sequence(__gp, __gp + {k} - 1)")).alias("__pos"),
        )
        .distinct()
    )
    kept = toks.select(
        id_col, F.posexplode("__t").alias("__pos", "__tok")
    ).join(covered, [id_col, "__pos"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(__pos, __tok))), s -> s.__tok)"
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("__n_kept"),
    )
    total = toks.select(id_col, F.size("__t").alias("__n"))
    return total.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.col("__n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("__n_kept"), F.lit(0)).cast("long").alias("n_kept_tokens"),
    )


def edit_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    edit_threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Character-level verification of MinHash-LSH candidates: each
    near-dup pair is re-scored with true Levenshtein distance and
    ``edit_sim = 1 - lev / max(len_a, len_b)`` — the final verify stage
    production dedup runs before destructive removal, because shingle
    Jaccard can rate a heavy reordering as near-identical while edit
    similarity exposes it (and vice versa for small in-place edits).

    Levenshtein is O(len_a * len_b) per pair — affordable ONLY because it
    runs strictly after LSH pruning: cost is per candidate pair, never
    per corpus pair. Text retrieval is two shuffle-hash joins keyed on
    doc id (candidates << corpus, and a broadcast would bet on
    cached-relation stats); the quadratic kernel itself is a JVM builtin
    (no Python). Two empty texts score edit_sim = 1.0.

    Returns (id_a, id_b, jaccard, lev_dist, edit_sim, verified) with
    verified = edit_sim >= ``edit_threshold``.
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, k, num_hashes, bands, threshold,
        max_bucket_size,
    )
    texts = df.select(F.col(id_col), F.col(text_col))
    a = texts.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")
    )
    b = texts.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")
    )
    j = (
        pairs.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
    )
    lev = F.levenshtein("__ta", "__tb")
    mx = F.greatest(F.length("__ta"), F.length("__tb"))
    edit_sim = F.when(mx == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - lev.cast("double") / mx.cast("double")
    )
    return j.select(
        "id_a",
        "id_b",
        "jaccard",
        lev.cast("int").alias("lev_dist"),
        edit_sim.alias("edit_sim"),
        (edit_sim >= F.lit(edit_threshold)).alias("verified"),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """CCNet-style corpus-level boilerplate line removal (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data"): a LINE is dropped iff its fingerprint occurs in >=
    ``min_docs`` DISTINCT documents — the filter that strips "all rights
    reserved" / cookie banners / nav menus from web text. Distinct from
    :func:`dup_span_dedup` (Lee et al. token k-grams) on three axes: the
    unit is the natural newline-delimited line, the threshold counts
    DOCUMENTS (not occurrences — within-document repetition of a
    corpus-rare line is preserved), and removal is line-aligned, never
    mid-span.

    Plan shape at 100 TB: lines explode map-side off the text scan; the
    duplicate-count groupBy keys on the 32-char md5 hex of the line (a
    fixed-width fingerprint, not the line text) so the corpus-scaled
    shuffle carries ~32 B/line regardless of line length; the surviving
    boilerplate set is tiny (lines crossing the doc threshold) and AQE
    plans the left-anti join as a broadcast; reassembly is one
    sorted-struct collect per document — deterministic, no window.

    Returns (id, clean_text, n_lines, n_kept_lines); a document that was
    ALL boilerplate survives as an empty string.
    """
    nl = "\n"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), nl)).alias("__ln", "__line"),
    ).withColumn("__lh", F.md5("__line"))
    boiler = (
        lines.groupBy("__lh")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= int(min_docs))
        .select("__lh")
    )
    kept = lines.join(boiler, "__lh", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ln", "__line"))),
                lambda s: s["__line"],
            ),
            nl,
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("n_kept_lines"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), nl)).cast("bigint").alias("n_lines"),
    )
    return totals.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce(F.col("n_kept_lines"), F.lit(0))
        .cast("bigint")
        .alias("n_kept_lines"),
    )
