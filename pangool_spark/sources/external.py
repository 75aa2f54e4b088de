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


#: Field types DefaultTupleDocumentConverter accepts
#: (``P/solr/DefaultTupleDocumentConverter.java:48-66`` checkFieldType) —
#: everything else is rejected before any document is sent.
_SOLR_PRIMITIVES = (
    "integer",
    "long",
    "string",
    "double",
    "float",
    "boolean",
    "short",
    "byte",
)


def default_document_converter(schema) -> Callable[[dict], dict]:
    """Parity port of ``DefaultTupleDocumentConverter`` semantics
    (``P/solr/DefaultTupleDocumentConverter.java:34-66``): primitive fields
    map 1:1 onto document fields; any non-primitive field type fails the
    job UP FRONT (the reference throws from checkFieldType per document —
    we can check once against the DataFrame schema)."""
    for f in schema.fields:
        if f.dataType.typeName() not in _SOLR_PRIMITIVES:
            raise TypeError(
                f"Field type: {f.dataType.simpleString()} not supported for "
                f"Tuple SOLR indexing! (field {f.name!r})"
            )
    return lambda row_dict: dict(row_dict)


def solr_sink(
    df: DataFrame,
    send_batch: Callable[[Any, list[dict]], None],
    make_client: Callable[[], Any] = lambda: None,
    close_client: Callable[[Any], None] = lambda c: None,
    batch_size: int = 20,
    thread_count: int = 2,
    queue_size: int = 100,
    converter: Callable[[dict], dict] | None = None,
) -> None:
    """Solr-style indexing sink with the reference's BatchWriter contract.

    Parity surface (``P/solr/TupleSolrOutputFormat.java:78-96`` defaults,
    ``P/solr/BatchWriter.java:153-200`` pool semantics):

    - ``batch_size`` docs per indexing batch (reference default 20);
    - ``thread_count`` concurrent indexing threads per task (default 2) —
      the remote service is the bottleneck, so intra-task send/convert
      overlap is worth real throughput;
    - ``queue_size`` bounds the number of PENDING batches (default 100);
      when full, the producing thread runs the batch itself — the exact
      back-pressure of the reference's ``CallerRunsPolicy`` pool: memory
      stays bounded at queue_size·batch_size docs however slow the sink is;
    - ``converter`` maps a row dict to a document dict; the default is the
      DefaultTupleDocumentConverter primitive mapping, which REJECTS
      non-primitive columns before launching the job;
    - close waits for every queued batch, then flushes the remainder and
      closes the client (``BatchWriter.close`` drains before commit).

    Like ``external_sink`` this is client-agnostic: the container has no
    solr client, so ``send_batch`` receives (client, docs) and the full
    batching/threading/back-pressure machinery is real and tested.
    """
    conv = converter if converter is not None else default_document_converter(df.schema)

    def handle_partition(rows: Iterable) -> None:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        client = make_client()
        pending: list = []
        lock = threading.Lock()
        first_error: list[BaseException] = []

        def run_batch(docs: list[dict]) -> None:
            try:
                send_batch(client, docs)
            except BaseException as exc:  # surfaced at close, like BatchWriter
                with lock:
                    if not first_error:
                        first_error.append(exc)

        pool = ThreadPoolExecutor(max_workers=max(1, thread_count))
        try:
            batch: list[dict] = []
            for row in rows:
                batch.append(conv(row.asDict(recursive=True)))
                if len(batch) >= batch_size:
                    docs, batch = batch, []
                    pending[:] = [f for f in pending if not f.done()]
                    if len(pending) >= queue_size:
                        run_batch(docs)  # CallerRunsPolicy back-pressure
                    else:
                        pending.append(pool.submit(run_batch, docs))
            for f in pending:
                f.result()
            if batch:
                run_batch(batch)
            if first_error:
                raise first_error[0]
        finally:
            pool.shutdown(wait=True)
            close_client(client)

    df.foreachPartition(handle_partition)
