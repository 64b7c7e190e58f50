"""Python UDTF example — the table-function extension point.

UDTFs are row-at-a-time Python (no Arrow batching) and therefore the SLOW
path; everything in this engine that could be a UDTF is instead a Generate
(explode) or mapInPandas.  This module exists to cover the extension point
with the honest caveat: use it for 1→N expansions whose logic genuinely
cannot be expressed with built-ins, at driver-controlled (small) scale.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk string, n_tokens int")
class ChunkDocument:
    """Split a document into fixed-token-count chunks — the LLM-pipeline
    'chunking' operator as a lateral table function.

    Usage::

        from pyspark.sql.functions import lit
        ChunkDocument(lit(text), lit(64))      # inline
        spark.udtf.register("chunk_document", ChunkDocument)
        spark.sql("SELECT d.doc_id, c.* FROM documents d, "
                  "LATERAL chunk_document(d.text, 64) c")
    """

    def eval(self, text: str, chunk_tokens: int):  # noqa: D102
        if text is None:
            return
        toks = text.split()
        for i, start in enumerate(range(0, len(toks), chunk_tokens)):
            piece = toks[start : start + chunk_tokens]
            yield i, " ".join(piece), len(piece)
