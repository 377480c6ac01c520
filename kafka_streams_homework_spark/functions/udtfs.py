"""Python UDTFs — the SQL-callable table-function extension surface
(Spark 4, SPARK-43798).

Where the reference's extension points are Java interfaces compiled
into the topology (ValueJoiner/Transformer — dsl/PriceAlertsApp.java,
processor/PurchaseQuantityAlertTrasformer.java), this engine's
user-extension surface for one-row-to-many-rows logic is a Python
UDTF: registered once per session, then callable from SQL via LATERAL
— no DataFrame code required on the caller's side.

Scale stance: a UDTF is still a Python crossing. ``useArrow=True``
moves rows in Arrow batches (the same transport as mapInPandas), not
one pickled row at a time, but the built-in column-function path
(operators.text.chunk_documents — pure SQL slice/posexplode) remains
the hot-path implementation; the UDTF twin exists for the SQL-surface
contract and is held to the same oracle. Prefer the built-in for
anything sf-proportional; reach for a UDTF when the fanout logic
genuinely can't be expressed in SQL (external tokenizers, codec
probes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(
    returnType="doc_id: bigint, chunk_idx: int, n_tokens: bigint, "
    "chunk_text: string",
    useArrow=True,
)
class ChunkDocumentsUDTF:
    """Overlapping token-window chunker — the UDTF twin of
    operators.text.chunk_documents, token contract functions.tokens
    (lowercase, split on single space, empty tokens preserved).
    """

    def eval(self, doc_id: int, text: str, chunk_tokens: int, stride: int):
        tok = (text or "").lower().split(" ")
        n = len(tok)
        num_chunks = max(-(-(n - chunk_tokens + stride) // stride), 1)
        for i in range(num_chunks):
            sl = tok[i * stride : i * stride + chunk_tokens]
            yield doc_id, i, len(sl), " ".join(sl)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF catalog for a session."""
    spark.udtf.register("doc_chunk_udtf", ChunkDocumentsUDTF)
