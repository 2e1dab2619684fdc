"""Python UDTFs [EXT]: table functions for 1->N text preprocessing shapes
that built-in generators can't express (stateful per-row logic with
data-dependent output cardinality).

``ChunkText`` is the training-data chunker: split a document into
fixed-size token windows with overlap (context chunking for pre-training /
RAG indexing). The tokenization here is whitespace (so a DuckDB oracle can
reproduce it bit-for-bit); a real deployment swaps in a BPE tokenizer
inside ``eval`` — the Spark-side plumbing (lateral join, schema, arrow
batching) is identical.

Scale: UDTFs run per-partition in Python workers; with
``spark.sql.execution.pythonUDTF.arrow.enabled=true`` rows move via Arrow
batches. The chunker is embarrassingly parallel (no state across rows), so
it scales with input partitions like any map-side operator.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


# useArrow pinned explicitly: with the default (None) the decorator resolves
# the Arrow setting at IMPORT time from whatever session happens to be
# active (usually none), silently falling back to the row-pickling path
@udtf(returnType="chunk_idx bigint, n_tokens bigint, chunk_hash string", useArrow=True)
class ChunkText:
    """Emit (chunk_idx, n_tokens, md5(chunk)) for fixed-size token windows.

    Windows start every ``chunk_size - overlap`` tokens; trailing windows
    may be shorter (down to 1 token). Empty / whitespace-only text emits
    nothing. The chunk hash pins exact chunk content without shipping the
    text back.
    """

    def eval(self, text: str, chunk_size: int, overlap: int):
        if text is None:
            return
        toks = text.lower().strip().split()
        if not toks:
            return
        stride = chunk_size - overlap
        if stride <= 0:
            raise ValueError("chunk_size must exceed overlap")
        for idx, start in enumerate(range(0, len(toks), stride)):
            chunk = toks[start : start + chunk_size]
            digest = hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()
            yield (idx, len(chunk), digest)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)
