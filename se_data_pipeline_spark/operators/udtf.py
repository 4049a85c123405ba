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


def make_kv_parse_udtf():
    """Polymorphic UDTF with a static `analyze` (Spark 4): parses
    'k=v;k=v' property strings into one row per pair, and derives its
    OUTPUT SCHEMA at plan time from the constant `keys` argument —
    the schema-from-arguments capability that fixed-returnType UDTFs
    (SentenceSplit above) cannot express. This is how a config-driven
    extractor ships as one operator instead of one UDTF per layout:
    the analyzer sees the requested keys, the optimizer sees real
    typed columns, and column pruning applies downstream as usual.

    Returned lazily from a factory because @udtf classes bind to the
    active SparkSession at registration, and tests create/tear down
    sessions."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class KVParse:
        @staticmethod
        def analyze(
            row_id: AnalyzeArgument,
            props: AnalyzeArgument,
            keys: AnalyzeArgument,
        ) -> AnalyzeResult:
            if not isinstance(keys.value, str) or not keys.value:
                raise ValueError(
                    "keys must be a non-empty constant string, e.g. 'a,b'"
                )
            fields = [StructField("row_id", LongType())]
            for k in keys.value.split(","):
                fields.append(StructField(k.strip(), StringType()))
            return AnalyzeResult(StructType(fields))

        def eval(self, row_id: int, props: str, keys: str):
            wanted = [k.strip() for k in keys.split(",")]
            pairs = {}
            if props:
                for item in props.split(";"):
                    if "=" in item:
                        k, v = item.split("=", 1)
                        pairs[k.strip()] = v.strip()
            yield (row_id, *[pairs.get(k) for k in wanted])

    return udtf(KVParse)
