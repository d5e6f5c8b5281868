"""Python UDTF surface (SURVEY §2.12): the registered, SQL-invocable
row→rows extension point matching the reference's Beam ``DoFn`` shape
(setup → per-row process → finish; reference main.py:37-111 —
``RouteFileToConfig``/``MapToMixpanelEvent`` are exactly flatMap-style
UDTFs with lifecycle hooks).

Spark-first position: everything the reference's DoFns do is compiled
to native Column expressions here (plans/compiler.py, operators/
routing.py) — a UDTF is the documented SLOW PATH for logic that
genuinely cannot be expressed as expressions (per-row imperative
control flow with accumulated state). These classes exist to close the
extension-point parity and are deliberately kept OUT of the oracle
query surface and hot paths; ``tests/test_udtf.py`` drives them through
SQL lateral joins.

At scale: a UDTF runs one Python worker per core with pickled row
transfer (or Arrow batches with ``useArrow=True``); cost is the same
order as any row-at-a-time Python — fine for control-plane-sized data,
wrong for the 100 TB scan path, exactly like the reference's own
per-row DoFns.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkText:
    """Row→rows chunker: split whitespace tokens into fixed-size
    windows (the UDTF twin of operators/corpus.py chunk_by_tokens,
    which is the native explode-based form to prefer in pipelines).

    ``eval`` is the DoFn ``process``; one instance per partition gives
    the same lifecycle envelope as setup/finish_bundle.
    """

    def eval(self, text: str, size: int):  # noqa: D102
        if text is None or size is None or size <= 0:
            return
        toks = text.split()
        for i in range(0, len(toks), size):
            window = toks[i : i + size]
            yield i // size, " ".join(window), len(window)


@udtf(returnType="event string, n_in_bundle int")
class TaggedExplode:
    """Demonstrates the ``terminate`` lifecycle hook (Beam
    ``finish_bundle``): emits one row per comma-separated element and,
    at partition end, a summary row counting elements seen by THIS
    worker — the pattern for per-bundle flush logic (e.g. the
    reference's batched HTTP POST DoFn main.py:306-344, which the real
    sink implements Arrow-natively in sinks/http_batch.py)."""

    def __init__(self):
        self._seen = 0

    def eval(self, csv: str):  # noqa: D102
        if not csv:
            return
        for item in csv.split(","):
            self._seen += 1
            yield item.strip(), None

    def terminate(self):  # noqa: D102
        yield "__bundle_end__", self._seen


def register_udtfs(spark) -> None:
    """Register the UDTF surface under stable SQL names."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("tagged_explode", TaggedExplode)
