"""End-to-end training-data curation plan.

The training-data analog of :mod:`plans.pipeline` (the ER flagship): one
composition that takes a raw document corpus to a training-ready,
split-assigned corpus using the operator family this repo provides —

1. **line-level boilerplate removal** (CCNet shape,
   :func:`operators.boilerplate.line_dedup`);
2. **quality gate** — whitespace-token floor and the stopword/alpha
   quality score (:mod:`operators.textstats`), thresholded;
3. **exact-duplicate collapse** — the canonical-keep decision of
   :func:`operators.dedup.duplicate_mapping` (keep ``min(doc_id)`` per
   content fingerprint), computed INLINE as one window over the
   fingerprint rather than by re-deriving the mapping and anti-joining:
   an anti-join's drop-list side would recompute the whole stage-1/2
   subtree a second time (Spark DAGs are trees; the shared prefix is
   not reused without an explicit persist), which at corpus scale
   doubles the most expensive stages to save one narrow shuffle;
4. **PII redaction** — the ordered regexp passes of
   :mod:`operators.pii` (URL first so embedded emails are swallowed
   whole), applied in place so lineage columns survive;
5. **deterministic split assignment** —
   :func:`operators.sampling.assign_splits` content-hash ranges.

Every stage is an exact, engine-portable transformation, so the WHOLE
chain has a DuckDB oracle (q_curation_pipeline) — unlike the ER flagship
whose pandas-UDF scoring kernel is pinned by fixtures instead.

Scale shape: stages 1 and 3 are the only shuffles (explode+agg on line
text; one window over the fingerprint); 2, 4 and 5 are narrow maps.
Stage order is deliberate: boilerplate removal BEFORE exact dedup (two
documents differing only in boilerplate become identical and collapse),
redaction AFTER dedup (regex passes run once per surviving doc, not per
duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark.sql.window import Window

from ..operators.boilerplate import line_dedup
from ..operators.dedup import normalize_text
from ..operators.pii import REDACTION_ORDER
from ..operators.sampling import assign_splits
from ..operators.textstats import quality_score, token_count


def curate(
    docs: DataFrame,
    *,
    min_docs_boiler: int = 10,
    min_tokens: int = 20,
    min_quality: float = 0.73,
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation chain; returns one row per surviving doc::

        (doc_id, text, n_lines_removed, split)

    ``n_lines_removed`` (boilerplate lines stripped from this document)
    is carried through as per-row lineage.  The quality threshold
    compares the score rounded to 6 decimals so the decision is
    engine-portable (float formatting parity with the SQL oracle).
    """
    ld = line_dedup(docs, min_docs=min_docs_boiler)
    gated = ld.filter(
        (token_count("text") >= min_tokens)
        & (F.round(quality_score("text"), 6) >= min_quality)
    ).drop("n_lines_kept")
    # canonical-keep in one pass: min(doc_id) per fingerprint, keep the
    # row that IS the minimum (singletons keep themselves) — same
    # decision as operators.dedup.duplicate_mapping, without consuming
    # `gated` twice
    w = Window.partitionBy(F.md5(normalize_text("text")))
    canon = (
        gated.withColumn("_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    redacted = F.col("text")
    for _, pattern, token in REDACTION_ORDER:
        redacted = F.regexp_replace(redacted, pattern, token)
    return assign_splits(
        canon.withColumn("text", redacted),
        ["doc_id"],
        splits or {"train": 0.9, "val": 0.05, "test": 0.05},
    )
