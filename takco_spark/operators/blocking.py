"""Blocking: documents → (block_key, doc_id) → candidate pairs.

Reference semantics being reproduced:
- token / inverted-index blocking: tables sharing any tokenized cell become
  candidates (CellJaccMatcher.block,
  /root/reference/takco/cluster/matchers/celljacc.py:63-69,102-105);
- MinHash-LSH blocking: 128-perm MinHash, banded LSH, candidates where
  estimated Jaccard ≥ threshold (LSHMatcher,
  /root/reference/takco/cluster/matchers/lsh.py:107-144,215-226).

Spark-first shape: a blocker is DATA, not an index object — it emits
``(block_key: string, doc_id: string)`` rows; candidate pairs are a
self-equi-join on ``block_key``. Skew is handled explicitly (north rule):

1. **hot-key drop**: keys with > ``max_block_size`` docs are dropped outright
   (stop-word tokens — quadratic pair blowup for near-zero precision);
2. **salting**: keys above ``salt_threshold`` are split into
   ceil(size/salt_threshold) salt buckets by hash(doc_id); pairs form only
   within a bucket.

Neither cap is silent: :func:`block_documents` returns a stats dict with
dropped/salted key counts, persisted into the stage's lineage metrics — the
analog of the reference's logged blocking reduction factor
(/root/reference/takco/cluster/cluster.py:385-390).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takco_spark.config import PipelineConfig
from takco_spark.functions.similarity import make_lsh_band_udf


class DeferredStats:
    """Resolve-on-first-access proxy for blocking statistics.

    The stats rollup is a driver sync (a collect over the cached key-size
    table), and the hot pipeline paths never read it — the scaling legs and
    the streaming per-batch path discard the stats entirely, and the
    headline query consumes them only when a caller actually inspects them.
    Deferring the collect removes one driver barrier per blocking pass
    (guide §5: the driver should not sync mid-pipeline for data nobody
    looks at); the observable-caps contract is unchanged — iterating,
    indexing, truth-testing or attribute access forces the same aggregate,
    once, memoized."""

    def __init__(self, fn):
        self._fn = fn
        self._val = None

    def _force(self):
        if self._val is None:
            self._val = self._fn()
        return self._val

    def __getattr__(self, name):  # proxied attribute access (e.g. .as_dict)
        return getattr(self._force(), name)

    def __iter__(self):
        return iter(self._force())

    def __len__(self):
        return len(self._force())

    def __getitem__(self, i):
        return self._force()[i]

    def __bool__(self):
        return bool(self._force())

    def __repr__(self):
        return repr(self._force())


@dataclass
class BlockingStats:
    blocker: str
    total_keys: int
    dropped_keys: int
    salted_keys: int
    candidate_rows: int
    #: estimated within-key pairs LOST to salting (pairs form only within a
    #: salt bucket, so a key of size n split into s buckets keeps ≈ n(n/s−1)/2
    #: of its n(n−1)/2 pairs) — makes the recall cost of the skew bound
    #: observable, never silent (ADVICE r1).
    salted_pairs_excluded_est: int = 0

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def _salt_excluded_expr(salt_threshold: int, max_block_size: int):
    """Aggregate expression over the key-size table: Σ over salted keys of
    (all within-key pairs − pairs retained inside salt buckets)."""
    n = F.col("n").cast("double")
    s = F.ceil(F.col("n") / salt_threshold).cast("double")
    excluded = (n * (n - 1) - n * (n / s - 1)) / 2.0
    cond = (F.col("n") > salt_threshold) & (F.col("n") <= max_block_size)
    return F.coalesce(
        F.sum(F.when(cond, excluded).otherwise(F.lit(0.0))), F.lit(0.0)
    ).cast("long")


#: namespace ids carried alongside hashed keys (stats attribution; the
#: string-keyed API encodes the namespace in the key prefix instead)
NS_TOKEN, NS_MINHASH, NS_EMBEDDING, NS_MEDIA = 0, 1, 2, 3
_NS_NAMES = {NS_TOKEN: "token", NS_MINHASH: "minhash",
             NS_EMBEDDING: "embedding", NS_MEDIA: "media"}


def token_blocks(features: DataFrame, cfg: PipelineConfig,
                 hashed: bool = False) -> DataFrame:
    """(doc_id, tokens) → (block_key='tok:'+token, doc_id). One shuffle
    (explode is narrow; the distinct-per-doc is already done upstream).

    ``hashed=True`` emits ``block_key = xxhash64(token)`` (long) instead of
    the string key — the pipeline's shuffle-byte optimization (a block key
    only needs IDENTITY, not content; hashing shrinks the 37M-row key stream
    from ~12-20-byte strings to 8-byte longs and makes every downstream
    groupBy/join hash fixed-width). xxhash64(token) is exactly the hash the
    MinHash signature path uses for its token stream, so hot-KEY hashes from
    this stream double as the signature exclusion list with no re-derivation.
    64-bit collisions merge two blocks spuriously (P ≈ n²/2⁶⁵ ≈ 10⁻⁵ at 37M
    keys) — harmless: a merged block only ADDS candidate pairs, which scoring
    filters."""
    tok = features.select(
        "doc_id", F.explode("tokens").alias("token")
    ).where(F.length("token") >= cfg.min_token_len)
    key = (F.xxhash64("token") if hashed
           else F.concat(F.lit("tok:"), F.col("token")))
    return tok.select(key.alias("block_key"), "doc_id")


def media_blocks(media_features: DataFrame, hashed: bool = False) -> DataFrame:
    """(doc_id, media_refs) → (block_key='med:'+ref, doc_id) — exact-key
    blocking on shared embedded media objects (interleaved text+media
    corpora: two documents embedding the same image/video are duplicate
    candidates regardless of their text).

    Same shape and skew discipline as :func:`token_blocks`: one narrow
    explode, fixed-width ``xxhash64`` keys under ``hashed=True``, and the
    union-level drop/salt caps bound any viral media object (a meme embedded
    by millions of pages is the media analog of a stop-word)."""
    refs = media_features.select(
        "doc_id", F.explode("media_refs").alias("ref")
    ).where(F.col("ref") != "")
    key = (F.xxhash64(F.concat(F.lit("med:"), F.col("ref"))) if hashed
           else F.concat(F.lit("med:"), F.col("ref")))
    return refs.select(key.alias("block_key"), "doc_id")


def minhash_blocks(features: DataFrame, cfg: PipelineConfig,
                   exclude_tokens: list[str] | None = None,
                   exclude_hashes: list[int] | None = None,
                   hashed: bool = False) -> DataFrame:
    """(doc_id, tokens) → one block key per LSH band: 'lsh{band}:{bandhash}'.

    Token hashing (xxhash64) runs JVM-side; the signature+banding runs in one
    Arrow-batched pandas UDF (functions.similarity).

    ``exclude_tokens``: stop-tokens removed from the MinHash input. Without
    this, two unrelated documents sharing only ubiquitous tokens have a small
    but nonzero per-band collision probability — and n²·ε spurious candidates
    grow QUADRATICALLY with corpus size (measured: 288k pairs at 120k docs →
    1.0M at 240k). Dropping tokens that are globally hot (same threshold as
    the block-size cap) zeroes the random-collision Jaccard while leaving
    true-duplicate similarity intact.

    ``exclude_hashes``: the same stop-token exclusion applied AFTER token
    hashing (values compared against xxhash64(token)) — what the pipeline
    passes when its hot-key list is already hashed (token_blocks hashed=True).

    ``hashed=True`` emits ``block_key = xxhash64(band, band_hash)`` (long)
    instead of the string key (see token_blocks on why identity-only keys
    should be fixed-width).
    """
    lsh_udf = make_lsh_band_udf(cfg.num_perm, cfg.lsh_bands, cfg.minhash_seed)
    toks = F.col("tokens")
    if exclude_tokens:
        toks = F.array_except(
            toks, F.array(*[F.lit(t) for t in exclude_tokens])
        )
    token_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    if exclude_hashes:
        token_hashes = F.array_except(
            token_hashes,
            F.array(*[F.lit(h).cast("long") for h in exclude_hashes]),
        )
    hashed_df = features.select(
        "doc_id", token_hashes.alias("token_hashes")
    )
    banded = hashed_df.select(
        "doc_id", F.posexplode(lsh_udf("token_hashes")).alias("band", "band_hash")
    )
    key = (F.xxhash64("band", "band_hash") if hashed
           else F.concat(F.lit("lsh"), F.col("band"), F.lit(":"),
                         F.col("band_hash")))
    return banded.select(key.alias("block_key"), "doc_id")


def _apply_cap_map(blocks: DataFrame, sizes: DataFrame,
                   cfg: PipelineConfig) -> DataFrame:
    """Apply drop + salt caps with ONE broadcast map and ONE join.

    Hot keys (heavy hitters above ``salt_threshold``) are few by
    construction, so both caps fit a single broadcast table keyed on
    block_key with ``nsalt = -1`` marking drop and ``nsalt >= 2`` marking a
    salted key — the r5 shape built two broadcasts (dropped anti-join +
    salt-map left join), which is two broadcast-build jobs and two probe
    passes over the big block stream per pipeline (guide §2.4)."""
    cap_map = sizes.where(
        (F.col("n") > cfg.salt_threshold) | (F.col("n") > cfg.max_block_size)
    ).select(
        "block_key",
        F.when(F.col("n") > cfg.max_block_size, F.lit(-1))
        .otherwise(F.ceil(F.col("n") / cfg.salt_threshold))
        .cast("int").alias("nsalt"),
    )
    return (
        blocks.join(F.broadcast(cap_map), "block_key", "left")
        .where(F.coalesce(F.col("nsalt"), F.lit(0)) >= 0)
        .select(
            "block_key",
            F.when(
                F.col("nsalt").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.col("nsalt")).cast("int"),
            ).otherwise(F.lit(0)).alias("salt"),
            "doc_id",
        )
    )


def apply_block_caps(
    blocks: DataFrame, cfg: PipelineConfig, blocker: str = "all"
) -> tuple[DataFrame, BlockingStats]:
    """Drop oversized keys, salt hot keys; returns (salted blocks, stats).

    Output schema: (block_key, salt, doc_id); downstream pair join keys on
    (block_key, salt).

    Cost discipline (matters at scale): the raw block stream is persisted and
    scanned exactly TWICE (once to size keys, once to apply the caps); all
    drop/salt statistics come from ONE aggregate over the (small) key-size
    table — never from repeated count() jobs over the big stream — and that
    aggregate is DEFERRED (r6): callers that never read the stats (the
    streaming per-batch path discards them) pay no driver barrier at all,
    and callers that do read them after the capped stream was consumed hit
    the already-warm sizes cache.
    """
    blocks = blocks.persist()
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("n")).persist()

    def _compute() -> BlockingStats:
        srow = sizes.agg(
            F.count("*").alias("total"),
            F.sum((F.col("n") > cfg.max_block_size).cast("long")).alias("dropped"),
            F.sum(
                (
                    (F.col("n") > cfg.salt_threshold)
                    & (F.col("n") <= cfg.max_block_size)
                ).cast("long")
            ).alias("salted"),
            _salt_excluded_expr(cfg.salt_threshold, cfg.max_block_size).alias(
                "salt_excl"),
        ).collect()[0]
        return BlockingStats(
            blocker=blocker,
            total_keys=int(srow["total"] or 0),
            dropped_keys=int(srow["dropped"] or 0),
            salted_keys=int(srow["salted"] or 0),
            candidate_rows=-1,
            salted_pairs_excluded_est=int(srow["salt_excl"] or 0),
        )

    out = _apply_cap_map(blocks, sizes, cfg)
    return out, DeferredStats(_compute)


def global_hot_tokens(features: DataFrame, cfg: PipelineConfig,
                      cap: int = 100_000) -> list[str]:
    """Tokens whose document frequency exceeds the block-size cap — the
    stop-token set excluded from the MinHash input (see minhash_blocks).

    The list is driver-collected but inherently bounded by Zipf reality;
    ``cap`` guards pathological inputs (truncation is logged, keeping the
    most frequent ones, not silent)."""
    df_counts = (
        features.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > cfg.max_block_size)
    )
    return _collect_hot(df_counts, cap)


def _collect_hot(df_counts: DataFrame, cap: int = 100_000) -> list[str]:
    """Collect a (token, df) table of hot tokens, keeping the HOTTEST ``cap``
    when it overflows — ordered truncation plus a logged warning, never an
    arbitrary silent subset. Hot tokens are few by construction (df > the
    block cap bounds their count at total_tokens/cap), so the sort input is
    small; it only pays off in the pathological-overflow case it guards."""
    rows = (
        df_counts.orderBy(F.col("df").desc(), "token").limit(cap + 1).collect()
    )
    toks = [r["token"] for r in rows]
    if len(toks) > cap:
        import logging

        logging.getLogger(__name__).warning(
            "hot-token list truncated at %d hottest (raise max_block_size "
            "for this corpus scale)", cap,
        )
        toks = toks[:cap]
    return toks


def block_documents(
    features: DataFrame, cfg: PipelineConfig,
    embeddings: DataFrame | None = None,
    media: DataFrame | None = None,
) -> tuple[DataFrame, list[BlockingStats]]:
    """Run the configured blockers and cap the UNION of their key streams.

    Returns (blocks(block_key, salt, doc_id), per-blocker stats).

    The blockers' key namespaces are disjoint ('tok:…' vs 'lsh<band>:…' vs
    'emb:…'), so one cap pass over the union is semantically identical to
    per-blocker passes but pays the sizes-groupBy / stats-collect / cap-join
    ONCE — fixed-cost discipline that matters both for tiny-corpus latency
    and for job-count at cluster scale. Per-blocker stats come from a single
    grouped aggregate over the (small) key-size table.

    ``embeddings``: (doc_id, emb) table required by the 'embedding' blocker
    (random-hyperplane buckets — the FAISS-blocking analog, SURVEY.md J3).

    ``media``: (doc_id, media_refs) table required by the 'media' blocker
    (spans.doc_media_features — exact-key blocking on shared media objects).
    """
    hashed = cfg.hashed_keys
    # the token key stream is shared: it feeds the union AND (persisted) the
    # hot-token derivation for the minhash exclude list — one explode, one
    # sizes groupBy, instead of a separate global_hot_tokens scan
    tb: DataFrame | None = None
    if "minhash" in cfg.blockers and "token" in cfg.blockers:
        tb = token_blocks(features, cfg, hashed=hashed).persist()

    parts: list[DataFrame] = []
    for blocker in cfg.blockers:
        if blocker == "token":
            part = tb if tb is not None else token_blocks(features, cfg,
                                                          hashed=hashed)
            ns = NS_TOKEN
        elif blocker == "minhash":
            if tb is not None:
                hot_df = (
                    tb.groupBy("block_key").agg(F.count("*").alias("df"))
                    .where(F.col("df") > cfg.max_block_size)
                )
                if hashed:
                    # hashed token keys ARE xxhash64(token) — the exact hash
                    # the signature path applies, so the hot-key list is the
                    # exclusion list with no token recovery needed
                    hot = _collect_hot(
                        hot_df.select(F.col("block_key").alias("token"), "df")
                    )
                    part = minhash_blocks(features, cfg, exclude_hashes=hot,
                                          hashed=True)
                else:
                    hot = _collect_hot(
                        hot_df.select(
                            F.expr("substring(block_key, 5)").alias("token"),
                            "df",
                        )
                    )
                    part = minhash_blocks(features, cfg, exclude_tokens=hot)
            else:
                hot = global_hot_tokens(features, cfg)
                part = minhash_blocks(features, cfg, exclude_tokens=hot,
                                      hashed=hashed)
            ns = NS_MINHASH
        elif blocker == "embedding":
            if embeddings is None:
                raise ValueError("'embedding' blocker requires an embeddings table")
            from takco_spark.operators.embedding import embedding_blocks

            part = embedding_blocks(embeddings, cfg.embedding_dim,
                                    cfg.emb_n_bits, cfg.seed)
            if hashed:
                part = part.select(
                    F.xxhash64("block_key").alias("block_key"), "doc_id"
                )
            ns = NS_EMBEDDING
        elif blocker == "media":
            if media is None:
                raise ValueError(
                    "'media' blocker requires a media features table "
                    "(spans.doc_media_features)")
            part = media_blocks(media, hashed=hashed)
            ns = NS_MEDIA
        else:
            raise ValueError(f"unknown blocker {blocker!r}")
        parts.append(part.select(
            F.lit(ns).cast("tinyint").alias("ns"), "block_key", "doc_id"
        ))
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionByName(p)

    raw = raw.persist()
    # key namespaces are disjoint (string mode: prefixes; hashed mode: the
    # ~10⁻⁵ cross-namespace collision odds documented on token_blocks), so
    # max(ns) attributes each key to its blocker for the stats rollup
    sizes = raw.groupBy("block_key").agg(
        F.count("*").alias("n"), F.max("ns").alias("ns")
    ).persist()
    def _compute_stats() -> list[BlockingStats]:
        srows = (
            sizes.groupBy("ns")
            .agg(
                F.count("*").alias("total"),
                F.sum((F.col("n") > cfg.max_block_size).cast("long")).alias(
                    "dropped"),
                F.sum(
                    (
                        (F.col("n") > cfg.salt_threshold)
                        & (F.col("n") <= cfg.max_block_size)
                    ).cast("long")
                ).alias("salted"),
                _salt_excluded_expr(cfg.salt_threshold, cfg.max_block_size).alias(
                    "salt_excl"
                ),
            )
            .collect()
        )
        return [
            BlockingStats(
                blocker=_NS_NAMES.get(r["ns"], str(r["ns"])),
                total_keys=int(r["total"] or 0),
                dropped_keys=int(r["dropped"] or 0),
                salted_keys=int(r["salted"] or 0),
                candidate_rows=-1,
                salted_pairs_excluded_est=int(r["salt_excl"] or 0),
            )
            for r in srows
        ]

    # DEFERRED (r6): the per-blocker rollup collect was a mid-pipeline
    # driver barrier that forced `raw` to materialize in its own job before
    # the caps/pairs job could start; deferred, the whole blocking union,
    # the cap broadcast and the pair generation run as ONE job, and the
    # rollup (when a caller reads it) replays from the warm sizes cache.
    stats = DeferredStats(_compute_stats)

    out = _apply_cap_map(raw, sizes, cfg)
    # NOT persisted: the pipeline consumes blocks ONCE (candidate_pairs is a
    # single groupBy scan, not a self-join), and `raw` above is already
    # cached — the cap map on top is one broadcast join. A second 37M-row
    # materialization here measured as pure overhead at bench scale; callers
    # that scan blocks repeatedly (tests, stats) recompute only the cheap
    # cap join from the cached union.
    return out, stats


def candidate_pairs(blocks: DataFrame) -> DataFrame:
    """Within-block pairing → canonical deduplicated pairs.

    ``doc_id_1 < doc_id_2`` canonicalization (reference drops self matches and
    already-seen pairs, /root/reference/takco/cluster/cluster.py:383,392-397);
    the pair may arise under many keys — we keep ONE representative
    ``block_key`` (the min) so the F1-at-shared-blocking-key metric can group
    by it, and dedup on the pair.

    Physical shape: ONE groupBy of the block stream into (key, salt) buckets
    (``collect_set`` → partial aggregation map-side), then the pair
    combinations are generated INSIDE each bucket row with array higher-order
    functions and exploded. Versus the naive self-equi-join this shuffles the
    57M-row block stream once instead of twice, builds no join hash maps,
    and lets singleton buckets (the vast majority of LSH bands) die in the
    size filter without ever reaching a join. Bucket size is bounded by the
    upstream cap/salting (``max_block_size``/``salt_threshold``), so the
    per-row combination payload is bounded too — safe at any corpus scale.
    """
    buckets = (
        blocks.groupBy("block_key", "salt")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    # ids sorted ascending → (x, every later y) enumerates each unordered
    # pair exactly once with doc_id_1 < doc_id_2 by construction
    pair_structs = F.expr("""
      flatten(transform(ids, (x, i) ->
        transform(slice(ids, i + 2, size(ids) - i - 1),
                  y -> struct(x as doc_id_1, y as doc_id_2))))
    """)
    exploded = buckets.select("block_key", F.explode(pair_structs).alias("p"))
    return exploded.groupBy(
        F.col("p.doc_id_1").alias("doc_id_1"),
        F.col("p.doc_id_2").alias("doc_id_2"),
    ).agg(F.min("block_key").alias("block_key"))
