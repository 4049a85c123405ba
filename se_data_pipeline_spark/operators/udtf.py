"""Python UDTF surface (Spark 4): one input row → N output rows with
engine-managed schema.

SURVEY D1 names the UDTF as the alternative delivery of the
segmentation operator (audio_vad.py:17-65 splits one recording into N
segments); `vad_split_segments` ships that as mapInPandas for Arrow
batching. This module keeps a real UDTF in the operator inventory for
the cases where per-row lazy expansion beats batch materialization —
e.g. splitting a huge document into sentences without holding every
sentence of the batch in one pandas frame.

UDTFs evaluate row-at-a-time in Python (no Arrow batching), so they
are the flexibility path, not the throughput path: use the JVM-side
explode/split composition when the split rule is expressible, and
mapInPandas when you need vectorized math over the batch. The tests
pin the semantic equivalence of all three forms.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="doc_id long, sent_idx int, sentence string, n_tokens int"
)
class SentenceSplit:
    """Split a document into sentences on ./!/? boundaries, one output
    row per non-empty sentence with its token count. Lazy generator:
    a huge document streams its sentences without materializing the
    full list. doc_id is passed through so no lateral join is needed
    to keep lineage.
    """

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        buf: list[str] = []
        idx = 0
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                sent = "".join(buf).strip()
                buf = []
                if sent:
                    yield doc_id, idx, sent, len(sent.split())
                    idx += 1
        tail = "".join(buf).strip()
        if tail:
            yield doc_id, idx, tail, len(tail.split())


def split_sentences(df, id_col: str = "doc_id", text_col: str = "text"):
    """Apply SentenceSplit laterally to every row of `df`. Output:
    (doc_id, sent_idx, sentence, n_tokens), one row per sentence.
    Row-local expansion — no shuffle; parallelism is the input
    partitioning."""
    spark = df.sparkSession
    spark.udtf.register("sentence_split", SentenceSplit)
    df.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        f"SELECT s.* FROM __udtf_docs, "
        f"LATERAL sentence_split({id_col}, {text_col}) s"
    )
