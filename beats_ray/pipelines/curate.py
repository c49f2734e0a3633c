"""Corpus curation pipeline — the composed training-data flow.

The individual LLM-pipeline stages (language ID, quality heuristics,
exact dedup, PII masking) each exist as standalone queries; real
curation runs them as ONE streaming pipeline (the C4/FineWeb recipe
shape: filter → dedup → redact). This module fuses the cheap per-row
signals (lang-ID + quality + the keep decision) into a single
map_batches pass — one scan, one actor-free fused task per block —
then hash-partitions once for the exact dedup and masks the survivors
in-stream. Nothing corpus-sized ever materializes:

    read(doc_id, text)
      → [fused: LangId + quality_batch + filter]     (map_batches)
      → exact_dedup (md5 → one co-locating shuffle)  (map_buckets)
      → mask_pii                                     (map_batches)

Scale shape: the only exchange is the dedup's hash partition; every
other stage is embarrassingly parallel over blocks, so the pipeline
streams end-to-end with backpressure at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa

from ..dataops.stagecache import task_stage
from ..dataops.textstats import LangId, quality_batch


class CurateSignals:
    """Fused per-row signal stage: language prediction + quality class
    + keep mask, one pass over the batch (LangId state — the marker
    probe table — is built once per worker via the stage cache)."""

    def __init__(self, keep_langs=("en",), min_chars: int = 50,
                 max_punct_ratio: float = 0.3):
        self.langid = LangId()
        self.keep_langs = set(keep_langs)
        self.min_chars = min_chars
        self.max_punct_ratio = max_punct_ratio

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lang = self.langid(t)["lang_pred"].combine_chunks()
        q = quality_batch(t, self.min_chars, self.max_punct_ratio)
        keep = pc.and_(
            pc.is_in(lang, value_set=pa.array(sorted(self.keep_langs))),
            pc.not_equal(q["quality"].combine_chunks(), "low"),
        )
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "lang_pred": lang,
                "quality": q["quality"],
                "n_chars": q["n_chars"],
            }
        )
        return out.filter(keep)


def curate_corpus(docs, keep_langs=("en",), min_chars: int = 50,
                  max_punct_ratio: float = 0.3):
    """Curate ``docs`` (doc_id, text): keep docs in ``keep_langs``
    whose quality is not 'low', drop exact duplicates (min-id
    survivor), mask PII in the survivors. Returns a Dataset
    [doc_id, lang_pred, quality, n_chars, masked_text]."""
    from ..dataops.dedup import exact_dedup
    from ..dataops.pii import mask_pii

    signals = docs.map_batches(
        task_stage(
            CurateSignals,
            keep_langs=tuple(sorted(keep_langs)),
            min_chars=min_chars,
            max_punct_ratio=max_punct_ratio,
        ),
        batch_format="pyarrow",
    )
    survivors = exact_dedup(signals, content_col="text", id_col="doc_id")
    masked = mask_pii(survivors, field="text", target="masked_text")
    return masked.select_columns(
        ["doc_id", "lang_pred", "quality", "n_chars", "masked_text"]
    )
