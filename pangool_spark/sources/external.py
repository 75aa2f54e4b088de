"""External sinks via foreachPartition — the Solr/Mongo sink pattern.

Ref ``TupleSolrOutputFormat`` (``P/solr/TupleSolrOutputFormat.java:46-109``,
batcher ``P/solr/BatchWriter.java``) and the Mongo example sink
(``EX/mongo/QypeScrapper.java:35``): push rows into an external service with
batching and bounded concurrency. Spark-first shape: ``foreachPartition``
with a per-partition client + batch buffer — one connection per task, Arrow
not needed (the bottleneck is the remote service).

The actual Solr/Mongo clients are not in this container; ``external_sink``
takes any ``make_client``/``send_batch`` callables so the pattern is real
and testable with a fake client.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame


def external_sink(
    df: DataFrame,
    send_batch: Callable[[Any, list[dict]], None],
    make_client: Callable[[], Any] = lambda: None,
    close_client: Callable[[Any], None] = lambda c: None,
    batch_size: int = 1000,
) -> None:
    """Write every row to an external service, ``batch_size`` rows at a time.

    Executes on executors: one client per partition, batched sends, final
    flush + close. Mirrors the reference's BatchWriter batching contract
    (batchSize/queue bounds) without its thread pool — partitions are
    Spark's concurrency unit.
    """

    def handle_partition(rows: Iterable) -> None:
        client = make_client()
        batch: list[dict] = []
        try:
            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    send_batch(client, batch)
                    batch = []
            if batch:
                send_batch(client, batch)
        finally:
            close_client(client)

    df.foreachPartition(handle_partition)
