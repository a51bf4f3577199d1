"""Python UDTFs (SURVEY.md §2.10: "PySpark ``@udtf`` where available").

``ChunkDocument`` — the one-to-many op a training-data pipeline runs just
before packing (operators/packing.py): split a document into chunks of at
most ``max_len`` characters, breaking on whitespace where possible so
tokens never split mid-word.  Deterministic; chunks concatenate back to
the exact original text (asserted in tests/test_udtf.py).

Why a UDTF and not ``explode``: the split is stateful along the string
(each boundary depends on the previous one), which has no clean
``F.sequence``/``F.split`` form with byte offsets; a UDTF keeps the
one-row-to-many-rows shape declarative and composable in SQL (``LATERAL``)
while the loop runs in Python.  The decorator requests ``useArrow=True``
(Arrow-batched exchange) and falls back to the default pickle path on
runtimes whose ``@udtf`` lacks the parameter — either way it sits OUTSIDE
the declared-query surface, whose no-Python-eval rule (tests/test_plans.py)
stays intact.

At 100 TB: a UDTF is a narrow map-side fan-out — no shuffle, output rows
stream per input partition; downstream writes should repartition by
output size (same note as the frame sampler, operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

_RETURN_TYPE = "chunk_idx int, start int, length int, chunk string"


def _decorate(cls):
    try:
        return udtf(cls, returnType=_RETURN_TYPE, useArrow=True)
    except TypeError:  # runtime without the useArrow parameter
        return udtf(cls, returnType=_RETURN_TYPE)


@_decorate
class ChunkDocument:
    """SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_document(d.text, 512) c"""

    def eval(self, text: str, max_len: int):  # noqa: D102
        if text is None or max_len is None or max_len <= 0:
            return
        pos, idx = 0, 0
        n = len(text)
        while pos < n:
            end = min(pos + max_len, n)
            if end < n:
                # prefer the last whitespace inside the window; hard-split
                # only when a single token exceeds max_len
                cut = text.rfind(" ", pos + 1, end)
                if cut > pos:
                    end = cut + 1  # keep the space with the left chunk
            yield idx, pos, end - pos, text[pos:end]
            idx += 1
            pos = end


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL/LATERAL use (idempotent)."""
    spark.udtf.register("chunk_document", ChunkDocument)
