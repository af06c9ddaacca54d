"""Deterministic synthetic corpus with planted duplicates (FIXTURES.md §1-3).

Generates the `input_hint`-shaped document table entirely as a pure function
of (doc_id, seed) — no RNG state, no wall clock — so every scale regenerates
bit-identically and tests/bench can derive golden clusters.

Layout per corpus of N docs:
- the first ``dup_fraction·N`` docs are grouped into entities of
  ``variants`` surface variants each (token-swap / char-edit / token-drop
  perturbations around a base name, plus a rare entity-specific token that
  guarantees a shared blocking key within the entity — FIXTURES.md §1
  "duplicate planting");
- the rest are singleton noise docs with unique tokens;
- EVERY doc also carries a couple of stop-word tokens ("the", "data", …) so
  hot-key dropping / salting is actually exercised at any scale;
- each doc ends with one media span (kind='media', media_ref set) so the
  span-sequence invariant covers media spans too; dup docs carry their
  ENTITY's media ref (duplicates embed the same media object — signal for
  the 'media' blocker/matcher), noise docs a per-doc one.

Generation is distributed: ``spark.range(N)`` → ``mapInPandas`` (Arrow
batches; the per-row work is trivial string assembly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from takco_spark.spans import SPANS_TYPE

_SYLLABLES = [c + v for c in "bdfgklmnprstvz" for v in "aeiou"]  # 70 syllables


def _word(h: int) -> str:
    """Deterministic pseudo-word from an integer.

    4 syllables → ~24M-word vocabulary: large enough that accidental token
    sharing between unrelated docs stays negligible at bench scales (a 343k
    vocabulary made candidate mass grow ~n²/|V| — mid-frequency tokens that
    the hot-key caps rightly don't touch; real corpora grow vocabulary with
    size, so the generator must too)."""
    s = []
    x = h & 0xFFFFFFFFFFFFFFFF
    for _ in range(4):
        s.append(_SYLLABLES[x % len(_SYLLABLES)])
        x //= len(_SYLLABLES)
    return "".join(s)


def _mix(*parts: int) -> int:
    """splitmix64-style integer hash — pure, portable, seedable."""
    x = 0x9E3779B97F4A7C15
    for p in parts:
        x = (x + p) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
    return x


_STOPWORDS = ["the", "data", "of", "table"]
_KIND_CYCLE = ["header", "cell", "cell", "mention", "cell"]


def _doc_tokens(i: int, n_dup: int, variants: int, seed: int,
                extra_tokens: int = 0) -> tuple[list[str], int]:
    """Token list + true_entity for doc index i.

    ``extra_tokens`` appends that many filler words drawn from a medium
    vocabulary (per-doc deterministic) — used by the bench corpus so per-doc
    compute (minhash, jaccard arrays) resembles real documents rather than
    4-token stubs. Fillers are doc-specific enough not to create new
    cross-entity blocking collisions beyond the stop-word ones.
    """
    if i < n_dup:
        entity = i // variants
        variant = i % variants
        base = [_word(_mix(seed, entity, j)) for j in range(3)] + [f"ent{entity}x"]
        if variant == 1 and len(base[1]) > 1:
            base[1] = base[1] + "q"  # char edit, Levenshtein distance 1
        elif variant == 2:
            base[0], base[1] = base[1], base[0]  # token swap
        elif variant >= 3:
            base = base[:2] + base[3:]  # token drop
        toks = base
        filler_key = entity  # fillers shared within entity → jaccard intact
    else:
        entity = 1_000_000_000 + i
        toks = [_word(_mix(seed, 7, i, j)) for j in range(4)] + [f"nz{i}"]
        variant = 0
        filler_key = 10_000_019 + i
    if extra_tokens:
        # fillers carry a wide numeric suffix so the filler vocabulary is
        # effectively unique per entity: they add per-doc compute (arrays,
        # minhash) WITHOUT adding cross-entity blocking collisions — the
        # stop-words alone exercise hot keys
        toks = toks + [
            _word(_mix(seed, 23, filler_key, j))
            + str(_mix(seed, 29, filler_key, j) % 99991)
            for j in range(extra_tokens)
        ]
    # two stop-words per doc → guaranteed hot blocking keys at any scale.
    # Dup docs draw them per-ENTITY (variant token sets stay high-Jaccard);
    # noise docs draw per-doc.
    key = entity if i < n_dup else i
    toks = toks + [_STOPWORDS[_mix(seed, key, 11) % len(_STOPWORDS)],
                   _STOPWORDS[_mix(seed, key, 13) % len(_STOPWORDS)]]
    return toks, entity


def _make_rows(ids: pd.Series, n_dup: int, variants: int, seed: int,
               extra_tokens: int = 0) -> pd.DataFrame:
    doc_ids, spans_col, entities = [], [], []
    for i in ids:
        i = int(i)
        toks, entity = _doc_tokens(i, n_dup, variants, seed, extra_tokens)
        spans = [
            {
                "kind": _KIND_CYCLE[j % len(_KIND_CYCLE)],
                "text": t,
                "media_ref": "",
                "offset": j,
            }
            for j, t in enumerate(toks)
        ]
        spans.append(
            {
                "kind": "media",
                "text": "",
                # dup docs embed their ENTITY's media object (same ref across
                # the duplicate set — the media blocker/matcher has signal);
                # noise docs get a per-doc ref
                "media_ref": f"m{_mix(seed, entity if i < n_dup else i, 17) % 100000}",
                "offset": len(toks),
            }
        )
        doc_ids.append(f"d{i:09d}")
        spans_col.append(spans)
        entities.append(entity)
    return pd.DataFrame(
        {"doc_id": doc_ids, "spans": spans_col, "true_entity": entities}
    )


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    dup_fraction: float = 0.6,
    variants: int = 3,
    seed: int = 42,
    partitions: int | None = None,
    extra_tokens: int = 0,
) -> DataFrame:
    """Distributed deterministic corpus: (doc_id, spans, true_entity).

    ``true_entity`` is the GOLD side table merged in for convenience — the
    pipeline must only read (doc_id, spans).
    """
    n_dup = int(n_docs * dup_fraction) // variants * variants
    schema = f"doc_id string, spans {SPANS_TYPE}, true_entity long"
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _make_rows(pdf["id"], n_dup, variants, seed, extra_tokens)

    return base.mapInPandas(gen, schema=schema)


_FIELD_NAMES = ["name", "city", "class"]


def _segmented_doc(entity: int, variant: int, seed: int,
                   scrambled: bool) -> list[dict]:
    """Span sequence for one sub-structured doc: 3 fields, each a 'header'
    span (field label) + 2 'cell' value spans.

    - true variants rotate field ORDER by variant (alignment must be
      order-invariant) and variant 1 perturbs one value token (char edit);
    - the scrambled doc has the SAME six value tokens as the entity but
      re-dealt across fields so no field survives intact — its whole-doc
      token set is IDENTICAL to variant 0's, which is exactly the case
      whole-document token matchers cannot reject and aligned scoring must.
      When scrambled, ``variant`` is the SCRAMBLER index (0 or 1): the two
      supported re-deals are distinct slot-wise derangements, so multiple
      scramblers per entity are not byte-identical to each other (gold
      counts each as its own singleton — identical payloads would penalize
      a pipeline that correctly merges exact duplicates).
    """
    vals = [
        [_word(_mix(seed, 3, entity, f, k)) for k in range(2)]
        for f in range(3)
    ]
    if scrambled:
        if variant == 0:
            fields = [
                [vals[(f + 1) % 3][0], vals[(f + 2) % 3][1]] for f in range(3)
            ]
        elif variant == 1:
            fields = [
                [vals[(f + 2) % 3][0], vals[(f + 1) % 3][1]] for f in range(3)
            ]
        else:
            raise ValueError(
                "at most 2 scramblers per entity are supported (each must be "
                "a distinct derangement of the value tokens)"
            )
        order = range(3)
    else:
        fields = [list(v) for v in vals]
        if variant == 1:
            fields[1][1] = fields[1][1] + "q"  # one char-edited value
        order = [(f + variant) % 3 for f in range(3)]
    spans, off = [], 0
    for f in order:
        spans.append({"kind": "header", "text": _FIELD_NAMES[f],
                      "media_ref": "", "offset": off})
        off += 1
        for v in fields[f]:
            spans.append({"kind": "cell", "text": v, "media_ref": "",
                          "offset": off})
            off += 1
    return spans


def synth_segmented_documents(
    spark: SparkSession,
    n_entities: int,
    variants: int = 3,
    scramblers: int = 1,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus of SUB-STRUCTURED documents for the aligned
    pipeline (A5/G3): per entity, ``variants`` true duplicates (field order
    rotated, one value perturbed) plus ``scramblers`` docs with the same
    token multiset re-partitioned across fields. Gold: the variants form one
    entity; each scrambler is its own singleton entity.

    (doc_id, spans, true_entity); doc_id = 'e{entity}v{k}' / 'e{entity}s{k}'.
    """
    if scramblers > 2:
        raise ValueError("scramblers > 2 unsupported (see _segmented_doc)")
    per = variants + scramblers
    schema = f"doc_id string, spans {SPANS_TYPE}, true_entity long"
    base = spark.range(0, n_entities * per, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, spans_col, entities = [], [], []
            for i in pdf["id"]:
                i = int(i)
                entity, j = divmod(i, per)
                scrambled = j >= variants
                spans = _segmented_doc(
                    entity, j - variants if scrambled else j, seed, scrambled
                )
                if scrambled:
                    doc_ids.append(f"e{entity:06d}s{j - variants}")
                    entities.append(1_000_000_000 + i)
                else:
                    doc_ids.append(f"e{entity:06d}v{j}")
                    entities.append(entity)
                spans_col.append(spans)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "spans": spans_col, "true_entity": entities}
            )

    return base.mapInPandas(gen, schema=schema)


def expected_clusters_py(n_docs: int, dup_fraction: float = 0.6,
                         variants: int = 3) -> dict[str, int]:
    """Driver-side golden mapping doc_id → entity (for small-corpus asserts)."""
    n_dup = int(n_docs * dup_fraction) // variants * variants
    out = {}
    for i in range(n_docs):
        entity = i // variants if i < n_dup else 1_000_000_000 + i
        out[f"d{i:09d}"] = entity
    return out
