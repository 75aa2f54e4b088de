"""JobBuilder: Pangool's grouped/join/rollup job declared against DataFrames.

Reference lifecycle being reproduced (SURVEY §3.1; cites /root/reference/):
declare (``P/tuplemr/TupleMRConfigBuilder.java:73-343``) → validate eagerly →
freeze an IR → map/shuffle/reduce. Here "declare" builds DataFrame
expressions, the IR *is* the Catalyst logical plan, and the shuffle is
Tungsten's — so the builder's job is eager validation (same error surface as
the reference) plus choosing between two compilation strategies:

1. **Algebraic fast path** — ``aggregate(*exprs)`` compiles to native
   ``groupBy().agg()``: Catalyst's partial aggregation replaces Pangool's
   map-side ``SimpleCombiner`` (``P/tuplemr/mapred/SimpleCombiner.java:35-117``)
   with whole-stage-codegen'd hash aggregates. This is the path the operator
   library uses everywhere it can.

2. **General reducer** — ``set_reducer(fn, schema)`` compiles to
   ``groupBy().applyInPandas`` (Arrow batches, not per-row Python). Each group
   arrives as a pandas frame sorted by the declared intra-group criteria
   (secondary sort: ``P/tuplemr/TupleMRConfigBuilder.java:296-343``), with
   multi-schema co-groups tagged by source (``__schema__``/``__source_order__``
   — ref schemaId tie-break ``P/tuplemr/mapred/SortComparator.java:250-256``).

Rollup (``set_rollup_from``) reproduces ``RollupReducer``'s open/close
callback semantics (``P/tuplemr/mapred/RollupReducer.java:47-243``): the
shuffle keys only on the rollup-base prefix (``P/tuplemr/TupleMRConfig.java:
239-252``) so every level of the hierarchy is co-located, and one pandas pass
over the sorted partition fires callbacks on prefix changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pangool_spark.orderby import Order, OrderBy, SOURCE_ORDER_FIELD, SortElement
from pangool_spark.schema import Schema, SchemaError

SCHEMA_FIELD = "__schema__"


class PlanError(ValueError):
    """Invalid job declaration (mirrors reference builder exceptions)."""


def _group_starts(pdf: pd.DataFrame, group_fields: Sequence[str]):
    """Positions where a new group begins (null-safe: two nulls compare
    equal, like the reference comparator). Always includes 0."""
    import numpy as np

    n = len(pdf)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for g in group_fields:
        codes = pd.factorize(pdf[g], use_na_sentinel=False)[0]
        change[1:] |= codes[1:] != codes[:-1]
    return np.flatnonzero(change)


def _complete_group_frames(batches, group_fields: Sequence[str]):
    """Re-chunk an Arrow batch stream into frames containing only COMPLETE
    groups.

    The open tail group is buffered as a list of batch views and
    concatenated exactly once — when its closing boundary arrives. The
    previous concat-the-carry-into-every-batch pattern copied a
    batch-spanning group O(span²): a group covering B consecutive Arrow
    batches was re-copied into each of the B concats (measured ~0.4 s of
    pure copying on a 200k-row group at 64k rows/batch). Group sizes are
    unbounded at 100 TB, so the walk must be linear in rows regardless of
    how many batches one group spans."""
    buf: list[pd.DataFrame] = []

    def row0_continues_buf(pdf: pd.DataFrame) -> bool:
        prev = buf[-1].iloc[len(buf[-1]) - 1]
        row0 = pdf.iloc[0]
        for g in group_fields:
            a, b = row0[g], prev[g]
            if not (a == b or (pd.isna(a) and pd.isna(b))):
                return False
        return True

    for pdf in batches:
        if not len(pdf):
            continue
        if buf:
            if row0_continues_buf(pdf):
                starts = _group_starts(pdf, group_fields)
                if len(starts) == 1:
                    # whole batch is inside the open group
                    buf.append(pdf)
                    continue
                cut = int(starts[1])
                buf.append(pdf.iloc[:cut])
                yield pd.concat(buf, ignore_index=True)
                buf = []
                pdf = pdf.iloc[cut:].reset_index(drop=True)
            else:
                out = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
                buf = []
                yield out.reset_index(drop=True)
        starts = _group_starts(pdf, group_fields)
        last_start = int(starts[-1])
        buf = [pdf.iloc[last_start:]]
        body = pdf.iloc[:last_start]
        if len(body):
            yield body.reset_index(drop=True)
    if buf:
        out = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
        yield out.reset_index(drop=True)


def _sort_pandas(pdf: pd.DataFrame, elements: Sequence[SortElement]) -> pd.DataFrame:
    """Stable multi-key sort honoring per-key direction AND null order.

    pandas ``sort_values`` has a single global ``na_position``; composing
    stable single-key sorts from last key to first gives per-key control.
    Groups are small (one key's rows), so this stays cheap.
    """
    for el in reversed(list(elements)):
        if el.name not in pdf.columns:
            continue
        ascending = el.order is Order.ASC
        from pangool_spark.orderby import NullOrder

        nulls_first = (
            el.null_order is NullOrder.NULL_SMALLEST
            if ascending
            else el.null_order is NullOrder.NULL_BIGGEST
        )
        pdf = pdf.sort_values(
            el.name,
            ascending=ascending,
            kind="stable",
            na_position="first" if nulls_first else "last",
        )
    return pdf.reset_index(drop=True)


@dataclass
class _Input:
    df: DataFrame
    schema: Schema
    order_index: int


class _PartitionCountersParam:
    """AccumulatorParam merging {partition_id: {counter: int}} updates.

    Keyed by partition id with REPLACE semantics so re-executions of the
    same partition (range-sort sampling jobs, retries, a second action on
    the same plan) stay idempotent instead of double-counting — stricter
    than Hadoop counters, which over-count on speculative attempts."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        a.update(b)
        return a


class Collector:
    """Reducer-side emit surface. Ref ``P/tuplemr/TupleReducer.java:70-99``.

    ``write`` appends one output row (dict keyed by output-schema field
    names); named outputs land in per-name buckets retrievable after the run
    via ``JobBuilder.named_output_rows`` compilation (see ``to_dataframes``).

    ``count`` increments a job counter, the reference's
    ``PangoolMultipleOutputs`` counter surface (``P/tuplemr/mapred/lib/
    output/PangoolMultipleOutputs.java:48-70``, Hadoop ``(group, name)``
    counters). Backed by a Spark accumulator flushed once per Arrow batch;
    like Hadoop counters, values are job-level telemetry — task retries can
    over-count, so don't derive data results from them.
    """

    def __init__(self, allow_named: bool = True) -> None:
        self.rows: list[dict[str, Any]] = []
        self.named: dict[str, list[dict[str, Any]]] = {}
        self.counters: dict[str, int] = {}
        self._allow_named = allow_named

    def write(self, row: dict[str, Any], output: str | None = None) -> None:
        if output is None:
            self.rows.append(row)
        elif not self._allow_named:
            # rollup-callback jobs have one output stream; dropping the row
            # silently would be worse than failing loudly.
            raise PlanError(
                f"named output {output!r} not supported from a rollup reducer"
            )
        else:
            self.named.setdefault(output, []).append(row)

    def count(self, name: str, n: int = 1, group: str | None = None) -> None:
        key = f"{group}.{name}" if group else name
        self.counters[key] = self.counters.get(key, 0) + n


class RollupReducer:
    """Callback contract. Ref ``P/tuplemr/TupleRollupReducer.java:34-79``.

    Subclass and override; ``depth`` counts fields of the group-by prefix,
    ``field`` is the group-by field name whose value changed, ``row`` is the
    first/last row (as a dict) of the opening/closing group.
    """

    def on_open_group(self, depth: int, field: str, row: dict, collector: Collector) -> None:
        pass

    def on_close_group(self, depth: int, field: str, row: dict, collector: Collector) -> None:
        pass

    def on_group_elements(self, group: dict, rows: pd.DataFrame, collector: Collector) -> None:
        pass


class JobBuilder:
    """Declarative grouped/join/rollup job. Ref ``P/tuplemr/TupleMRBuilder.java``."""

    def __init__(self, spark: SparkSession, name: str = "pangool_job"):
        self.spark = spark
        self.name = name
        self._inputs: list[_Input] = []
        self._group_by: list[str] = []
        self._order_by: OrderBy | None = None
        self._specific_order_by: dict[str, OrderBy] = {}
        self._rollup_from: str | None = None
        self._custom_partition_fields: list[str] | None = None
        self._reducer: Callable | None = None
        self._reducer_vectorized: bool = False
        self._rollup_reducer: RollupReducer | None = None
        self._output_schema: Schema | None = None
        self._agg_exprs: list[Column] | None = None
        self._named_outputs: dict[str, Schema] = {}
        self._counter_acc = None

    @property
    def counters(self) -> dict[str, int]:
        """Counter values accumulated by ``collector.count`` calls; valid
        after an action has run on the compiled DataFrame (Spark
        accumulators update on task completion)."""
        if self._counter_acc is None:
            return {}
        totals: dict[str, int] = {}
        for per_part in self._counter_acc.value.values():
            for k, v in per_part.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def _make_counter_acc(self):
        if self._counter_acc is None:
            self._counter_acc = self.spark.sparkContext.accumulator(
                {}, _PartitionCountersParam()
            )
        return self._counter_acc

    # -- declaration -------------------------------------------------------
    def add_input(self, df: DataFrame, schema: Schema | str, mapper: Callable[[DataFrame], DataFrame] | None = None) -> "JobBuilder":
        """Register one source with its intermediate schema.

        ``mapper`` is the per-input transform (ref per-input TupleMapper,
        ``P/tuplemr/MultipleInputsInterface.java:27-56``) — a DataFrame →
        DataFrame function applied before conforming to the schema.
        """
        if isinstance(schema, str):
            schema = Schema.parse(f"schema{len(self._inputs)}", schema)
        if any(i.schema.name == schema.name for i in self._inputs):
            raise PlanError(f"duplicate intermediate schema {schema.name!r}")
        if mapper is not None:
            df = mapper(df)
        df = schema.conform(df)
        self._inputs.append(_Input(df=df, schema=schema, order_index=len(self._inputs)))
        return self

    def set_group_by(self, *fields: str) -> "JobBuilder":
        """Ref ``setGroupByFields`` (``P/tuplemr/TupleMRConfigBuilder.java:114-142``):
        each field must exist with the same type in every intermediate schema."""
        if not fields:
            raise PlanError("group-by needs at least one field")
        self._group_by = list(fields)
        return self

    def set_order_by(self, order_by: OrderBy | str) -> "JobBuilder":
        self._order_by = OrderBy.parse(order_by) if isinstance(order_by, str) else order_by
        return self

    def set_specific_order_by(self, schema_name: str, order_by: OrderBy | str) -> "JobBuilder":
        """Per-source secondary sort inside a co-group
        (ref ``P/tuplemr/TupleMRConfigBuilder.java:296-343``)."""
        self._specific_order_by[schema_name] = (
            OrderBy.parse(order_by) if isinstance(order_by, str) else order_by
        )
        return self

    def set_rollup_from(self, field: str) -> "JobBuilder":
        """Ref ``setRollupFrom`` (``P/tuplemr/TupleMRConfigBuilder.java:146-165``)."""
        self._rollup_from = field
        return self

    def set_custom_partition_fields(self, *fields: str) -> "JobBuilder":
        """Ref ``P/tuplemr/TupleMRConfigBuilder.java:169-190``."""
        self._custom_partition_fields = list(fields)
        return self

    def set_reducer(
        self,
        fn: Callable[[tuple, pd.DataFrame, Collector], None],
        output_schema: Schema | str,
        vectorized: bool = False,
    ) -> "JobBuilder":
        """General reducer: ``fn(group_key_tuple, sorted_rows, collector)``.

        Ref ``TupleReducer.reduce`` (``P/tuplemr/TupleReducer.java:56-59``) —
        may emit 0..N rows of the output schema via the collector.

        ``vectorized=True`` selects the v2 whole-partition contract:
        ``fn(keys, offsets, rows) -> pd.DataFrame`` where ``rows`` is a
        sorted chunk of the partition (every group fully contained),
        ``offsets`` is an int64 array of length n_groups+1 (group ``i``
        spans ``rows[offsets[i]:offsets[i+1]]``), and ``keys`` is a
        DataFrame of the group-key columns with one row per group. The
        reducer returns the output rows for ALL groups at once — or, on a
        named-outputs job compiled via ``to_dataframes()``, a dict
        ``{output_name: DataFrame}`` with ``""`` for the main output —
        numpy kernels like ``np.add.reduceat(col, offsets[:-1])`` replace the
        per-group Python invocation (~0.5 ms/group floor), which dominates
        reduce time when groups are small and plentiful. Counters and named
        outputs stay on the per-group contract.
        """
        self._reducer = fn
        self._reducer_vectorized = bool(vectorized)
        self._output_schema = (
            Schema.parse("output", output_schema) if isinstance(output_schema, str) else output_schema
        )
        return self

    def set_rollup_reducer(self, reducer: RollupReducer, output_schema: Schema | str) -> "JobBuilder":
        self._rollup_reducer = reducer
        self._output_schema = (
            Schema.parse("output", output_schema) if isinstance(output_schema, str) else output_schema
        )
        return self

    def aggregate(self, *exprs: Column) -> "JobBuilder":
        """Algebraic fast path → native ``agg()`` (partial agg = combiner)."""
        self._agg_exprs = list(exprs)
        return self

    def add_named_output(self, name: str, schema: Schema | str) -> "JobBuilder":
        """Declare a named side output the reducer can write to with
        ``collector.write(row, output=name)``.

        Ref ``PangoolMultipleOutputs`` (``P/tuplemr/mapred/lib/output/
        PangoolMultipleOutputs.java:48-70``, builder
        ``P/tuplemr/TupleMRBuilder.java:164-206``): side outputs with their
        own schemas from one reduce pass. Compiled as ONE job whose rows
        carry an output tag + JSON payload; ``to_dataframes()`` derives each
        output from the cached result — the reduce runs once, like the
        reference.
        """
        if not name:
            raise PlanError("named output needs a non-empty name")
        if name in ("__main__", "__output__"):
            raise PlanError(
                f"named output {name!r} is reserved (the main-output slot and "
                "the tag column of the compiled multiple-outputs struct)"
            )
        if name in self._named_outputs:
            raise PlanError(f"duplicate named output {name!r}")
        self._named_outputs[name] = (
            Schema.parse(name, schema) if isinstance(schema, str) else schema
        )
        return self

    # -- validation (eager, mirrors reference builder errors) --------------
    def _validate(self) -> None:
        if not self._inputs:
            raise PlanError("no inputs declared")
        if not self._group_by:
            raise PlanError("no group-by declared")
        for inp in self._inputs:
            for gf in self._group_by:
                try:
                    canonical = inp.schema.resolve(gf)
                except SchemaError as exc:
                    raise PlanError(
                        f"group-by field {gf!r} missing from schema {inp.schema.name!r}"
                    ) from exc
                dtype = inp.schema.field(canonical).dtype
                ref_dtype = self._inputs[0].schema.field(
                    self._inputs[0].schema.resolve(gf)
                ).dtype
                if dtype != ref_dtype:
                    raise PlanError(
                        f"group-by field {gf!r} type mismatch across schemas: "
                        f"{ref_dtype.simpleString()} vs {dtype.simpleString()}"
                    )
        if self._order_by is not None and not self._order_by.starts_with(self._group_by):
            # ref: group-by must be a prefix of common order
            # (P/tuplemr/TupleMRConfigBuilder.java:282-288)
            prefix = set(self._order_by.field_names[: len(self._group_by)])
            if prefix != set(self._group_by):
                raise PlanError(
                    "common order-by must start with the group-by fields "
                    f"(group={self._group_by}, order={self._order_by.field_names})"
                )
        if self._rollup_from is not None:
            if self._rollup_from not in self._group_by:
                raise PlanError(
                    f"rollup-from field {self._rollup_from!r} must be one of the "
                    f"group-by fields {self._group_by}"
                )
        n_strategies = sum(
            1 for s in (self._reducer, self._rollup_reducer, self._agg_exprs) if s is not None
        )
        if n_strategies != 1:
            raise PlanError("declare exactly one of: reducer, rollup reducer, aggregate()")

    # -- compilation -------------------------------------------------------
    def _tagged_union(self) -> DataFrame:
        """Union all conformed inputs with source tags.

        Replaces the reference's common/specific schema split + schemaId
        serialization (``P/tuplemr/SerializationInfo.java:268-328``): Spark's
        columnar shuffle makes the layout optimization moot; semantically the
        union-by-name with null-filled specific columns is identical.
        """
        tagged = []
        for inp in self._inputs:
            df = inp.df
            # canonicalize group-by names via aliases so the union lines up
            renames = {}
            for gf in self._group_by:
                canonical = inp.schema.resolve(gf)
                if canonical != gf:
                    renames[canonical] = gf
            for old, new in renames.items():
                df = df.withColumnRenamed(old, new)
            tagged.append(
                df.withColumn(SCHEMA_FIELD, F.lit(inp.schema.name)).withColumn(
                    SOURCE_ORDER_FIELD, F.lit(inp.order_index)
                )
            )
        out = tagged[0]
        for df in tagged[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        return out

    def _intra_group_sort_elements(self) -> list[SortElement]:
        """Sort keys applied inside each group (after the group prefix)."""
        elements: list[SortElement] = []
        if self._order_by is not None:
            elements.extend(self._order_by.elements[len(self._group_by):])
        for ob in self._specific_order_by.values():
            # specific criteria apply after the source-order tie-break; a
            # single combined stable sort keyed (common..., source, specific...)
            # reproduces the reference ordering because specific fields are
            # null outside their source.
            elements.extend(ob.elements)
        return elements

    def _partition_fields(self) -> list[str]:
        if self._custom_partition_fields:
            return self._custom_partition_fields
        if self._rollup_from is not None:
            # partition on the rollup-base prefix so all levels co-locate
            # (ref P/tuplemr/TupleMRConfig.java:239-252)
            idx = self._group_by.index(self._rollup_from)
            return self._group_by[: idx + 1] or self._group_by[:1]
        return self._group_by

    def to_dataframe(self) -> DataFrame:
        self._validate()
        if self._agg_exprs is not None:
            df = self._tagged_union()
            if self._rollup_from is not None:
                # aggregate-form rollup → native rollup (one shuffle, Expand)
                return df.rollup(*self._group_by).agg(*self._agg_exprs)
            return df.groupBy(*self._group_by).agg(*self._agg_exprs)

        union = self._tagged_union()
        out_struct = self._output_schema.to_struct()

        if self._rollup_reducer is not None:
            return self._compile_rollup(union, out_struct)
        return self._compile_general_reducer(union, out_struct)

    @staticmethod
    def _output_slot(name: str) -> str:
        return "__main__" if name == "" else name

    def to_dataframes(self) -> dict[str, DataFrame]:
        """Main output under ``""`` plus every declared named output.

        The reduce runs ONCE: rows leave the reducer as a tagged struct —
        one nullable struct slot per declared output, exactly one non-null
        per row — the tagged frame is cached, and each output is a filter +
        struct expansion. N sinks, one shuffle, like the reference's
        one-job multiple-outputs; Arrow carries the types end-to-end
        (timestamps/binary/decimals keep full fidelity, and a type mismatch
        fails fast instead of nulling rows like a JSON round-trip would).
        """
        if not self._named_outputs:
            return {"": self.to_dataframe()}
        self._validate()
        if self._agg_exprs is not None:
            raise PlanError("named outputs require a reducer (aggregate() has one output)")
        if self._reducer is None:
            raise PlanError(
                "named outputs require set_reducer(...); the rollup-callback "
                "path has a single output stream"
            )
        union = self._tagged_union()
        all_outputs = [("", self._output_schema), *self._named_outputs.items()]
        tag_struct = T.StructType(
            [T.StructField("__output__", T.StringType(), False)]
            + [
                T.StructField(self._output_slot(name), schema.to_struct(), True)
                for name, schema in all_outputs
            ]
        )
        tagged = self._compile_general_reducer(union, tag_struct, emit_tagged=True).cache()
        outputs: dict[str, DataFrame] = {}
        for name, _schema in all_outputs:
            slot = self._output_slot(name)
            outputs[name] = (
                tagged.filter(F.col("__output__") == name).select(f"`{slot}`.*")
            )
        return outputs

    def _reduce_parallelism(self, df: DataFrame) -> int:
        """Partition count for Python reduce stages: never below the
        cluster's core count, never below the configured shuffle
        parallelism. On a 1000-executor cluster this is the shuffle
        setting; on local[32] it guarantees all cores work."""
        sc = df.sparkSession.sparkContext
        shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        return max(sc.defaultParallelism, shuffle)

    def _compile_general_reducer(
        self, union: DataFrame, out_struct: T.StructType, emit_tagged: bool = False
    ) -> DataFrame:
        """General reducer as the MapReduce streaming-reduce pattern.

        ``repartition(partition_fields)`` + ``sortWithinPartitions(group +
        source-order + intra criteria)`` + ``mapInPandas`` that walks the
        contiguous groups inside each Arrow batch — the exact shape of the
        reference's shuffle→SortComparator→SimpleReducer pipeline
        (``P/tuplemr/mapred/SimpleReducer.java:43-132``), one exchange total.

        Versus ``groupBy().applyInPandas`` this amortizes the per-group
        Arrow transfer + Python invocation (~0.5 ms/group → ~µs/group): at
        150k small groups that is the difference between 90 s and seconds.
        A group can span Arrow batch boundaries, so the last (possibly
        incomplete) group of every batch is carried into the next; partition
        boundaries are real group boundaries because the shuffle hashes on
        the group prefix.
        """
        group_fields = list(self._group_by)
        sort_elements = self._intra_group_sort_elements()
        use_source_order = len(self._inputs) > 1
        reducer = self._reducer
        out_columns = [f.name for f in out_struct.fields]
        partition_fields = self._partition_fields()
        counter_acc = self._make_counter_acc()

        sort_cols = [F.col(g).asc_nulls_first() for g in group_fields]
        if use_source_order:
            sort_cols.append(F.col(SOURCE_ORDER_FIELD).asc())
        sort_cols.extend(e.to_column() for e in sort_elements)

        # Explicit partition count: AQE's coalescing targets ~64 MB of
        # shuffle BYTES, which underestimates the cost of a Python reduce
        # stage by orders of magnitude (measured: 10 tasks on 32 cores,
        # 3× slower). A user-specified count is exempt from coalescing, so
        # the reduce stage keeps cluster-wide parallelism.
        n_parts = self._reduce_parallelism(union)
        arranged = union.repartition(
            n_parts, *[F.col(c) for c in partition_fields]
        ).sortWithinPartitions(*sort_cols)

        if self._reducer_vectorized:
            return self._run_vectorized_reducer(
                arranged, out_struct, group_fields, reducer, emit_tagged=emit_tagged
            )

        def collector_frame(collector: Collector):
            if emit_tagged:
                # tagged-struct rows: one nullable struct slot per output,
                # exactly one non-null per row; Arrow carries the nested
                # types natively (no JSON, no fidelity loss)
                slot_names = out_columns[1:]  # after __output__
                records = []
                for name, named_rows in [("", collector.rows), *collector.named.items()]:
                    slot = "__main__" if name == "" else name
                    for r in named_rows:
                        rec = {"__output__": name}
                        for s in slot_names:
                            rec[s] = r if s == slot else None
                        records.append(rec)
                if records:
                    return pd.DataFrame(records, columns=out_columns)
                return None
            if collector.rows:
                return pd.DataFrame(collector.rows, columns=out_columns)
            return None

        def run_partition(batches):
            part_counters: dict[str, int] = {}

            # _complete_group_frames buffers the batch-spanning tail group
            # (linear in rows, however many batches one group spans), so
            # every frame here holds only complete groups.
            def reduce_frame(pdf: pd.DataFrame):
                collector = Collector()
                for key, sub in pdf.groupby(group_fields, sort=False, dropna=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    reducer(key, sub.reset_index(drop=True), collector)
                for k, v in collector.counters.items():
                    part_counters[k] = part_counters.get(k, 0) + v
                return collector_frame(collector)

            for frame in _complete_group_frames(batches, group_fields):
                out = reduce_frame(frame)
                if out is not None:
                    yield out
            if part_counters:
                from pyspark import TaskContext

                counter_acc.add({TaskContext.get().partitionId(): part_counters})

        return arranged.mapInPandas(run_partition, schema=out_struct)

    @staticmethod
    def _run_vectorized_reducer(
        arranged: DataFrame,
        out_struct: T.StructType,
        group_fields: list,
        reducer: Callable,
        emit_tagged: bool = False,
    ) -> DataFrame:
        """v2 reduce contract: group boundaries computed once per chunk
        (factorized codes → null-safe change mask), the reducer sees
        (keys, offsets, rows) for the whole chunk. Chunks come from
        ``_complete_group_frames``, which buffers the batch-spanning tail
        group linearly — partition boundaries are true group boundaries
        because the shuffle hashes the group prefix.

        With ``emit_tagged`` (named-outputs jobs), the reducer may return a
        dict ``{output_name: DataFrame}`` (``""`` = main output) instead of
        a single frame; each frame lands in its output's struct slot of the
        tagged row stream — same one-shuffle multiple-outputs shape as the
        per-group collector contract, but built COLUMNAR via ``mapInArrow``
        (``pa.StructArray`` per slot + typed null arrays), never dict-per-
        row records."""
        import numpy as np

        out_columns = [f.name for f in out_struct.fields]

        def chunks_of(batches):
            """(keys, offsets, rows) per complete-group chunk."""
            for pdf in _complete_group_frames(batches, group_fields):
                starts = _group_starts(pdf, group_fields)
                offsets = np.append(starts, len(pdf)).astype(np.int64)
                keys = pdf.iloc[offsets[:-1]][group_fields].reset_index(drop=True)
                yield keys, offsets, pdf

        if not emit_tagged:

            def run_partition(batches):
                for keys, offsets, pdf in chunks_of(batches):
                    out = reducer(keys, offsets, pdf)
                    if isinstance(out, dict):
                        raise PlanError(
                            "vectorized reducer returned a dict but the job has "
                            "no named outputs; compile with to_dataframes() "
                            "after add_named_output(...)"
                        )
                    if out is None or not len(out):
                        continue
                    yield out[out_columns]

            return arranged.mapInPandas(run_partition, schema=out_struct)

        # tagged path: one Arrow RecordBatch per (chunk, output) — the
        # output's rows become a StructArray in its slot, every other slot
        # is a typed null array, so multiple-outputs rows stay columnar
        # end-to-end (the dict-per-row form paid a Python object per cell)
        try:
            from pyspark.sql.pandas.types import to_arrow_type
        except ImportError:  # pragma: no cover - semi-internal module path
            # fall back to the row-dict pandas form: slower, same results
            def run_tagged_pandas(batches):
                for keys, offsets, pdf in chunks_of(batches):
                    result = reducer(keys, offsets, pdf)
                    if result is None:
                        continue
                    if isinstance(result, pd.DataFrame):
                        result = {"": result}
                    parts = []
                    for name, frame in result.items():
                        slot = "__main__" if name == "" else name
                        if slot not in out_columns[1:]:
                            raise PlanError(f"undeclared named output {name!r}")
                        if frame is None or not len(frame):
                            continue
                        records = frame.to_dict("records")
                        part = pd.DataFrame({"__output__": [name] * len(records)})
                        for s in out_columns[1:]:
                            part[s] = [r if s == slot else None for r in records]
                        parts.append(part)
                    if parts:
                        yield pd.concat(parts, ignore_index=True)[out_columns]

            return arranged.mapInPandas(run_tagged_pandas, schema=out_struct)

        def nullable_struct(dt):
            # pandas-built StructArrays always carry nullable children; a
            # cast to the not-null variant refuses, and Spark's Arrow
            # reader accepts the nullable form
            import pyarrow as pa

            at = to_arrow_type(dt)
            return pa.struct([pa.field(f.name, f.type, nullable=True) for f in at])

        slot_names = out_columns[1:]
        slot_arrow = {
            f.name: nullable_struct(f.dataType) for f in out_struct.fields[1:]
        }
        slot_fields = {
            f.name: [sf.name for sf in f.dataType.fields]
            for f in out_struct.fields[1:]
        }

        def run_partition_arrow(record_batches):
            import pyarrow as pa

            def pandas_batches():
                for rb in record_batches:
                    yield pa.Table.from_batches([rb]).to_pandas()

            for keys, offsets, pdf in chunks_of(pandas_batches()):
                result = reducer(keys, offsets, pdf)
                if result is None:
                    continue
                if isinstance(result, pd.DataFrame):
                    result = {"": result}
                for name, frame in result.items():
                    slot = "__main__" if name == "" else name
                    if slot not in slot_arrow:
                        raise PlanError(f"undeclared named output {name!r}")
                    if frame is None or not len(frame):
                        continue
                    n = len(frame)
                    arrays = [pa.array([name] * n, type=pa.string())]
                    for s in slot_names:
                        if s == slot:
                            sub = pa.Table.from_pandas(
                                frame[slot_fields[s]], preserve_index=False
                            )
                            arr = pa.StructArray.from_arrays(
                                [
                                    sub.column(i).combine_chunks()
                                    for i in range(sub.num_columns)
                                ],
                                names=sub.column_names,
                            ).cast(slot_arrow[s])
                        else:
                            arr = pa.nulls(n, type=slot_arrow[s])
                        arrays.append(arr)
                    yield pa.RecordBatch.from_arrays(arrays, names=out_columns)

        return arranged.mapInArrow(run_partition_arrow, schema=out_struct)

    def _compile_rollup(self, union: DataFrame, out_struct: T.StructType) -> DataFrame:
        """Callback-form rollup: one shuffle on the base prefix, then a sorted
        pandas walk firing open/close at each level change.

        Ordering contract matched against ``RollupReducer.run``
        (``P/tuplemr/mapred/RollupReducer.java:129-202``): opens fire
        outermost→innermost on the first tuple of each new prefix, closes fire
        innermost→outermost on the last tuple before a prefix change, and all
        trailing groups close after the final tuple (``:138-145``).
        """
        group_fields = list(self._group_by)
        base_fields = self._partition_fields()
        use_source_order = len(self._inputs) > 1
        reducer = self._rollup_reducer
        out_columns = [f.name for f in out_struct.fields]
        n_levels = len(group_fields)
        # Callbacks fire only for depths in [min_depth, maxDepth] and the
        # mismatch depth clamps UP to min_depth — exact RollupReducer
        # contract (P/tuplemr/mapred/RollupReducer.java:79,163-180): fields
        # before rollup-from are partition constants, never opened/closed.
        min_depth = len(base_fields) - 1
        counter_acc = self._make_counter_acc()

        # One shuffle keyed on the base prefix; the FULL sort happens in
        # Tungsten (spill-safe), not pandas: base fields, then the remaining
        # group levels, then source order, then intra-group criteria — the
        # same composite the reference's SortComparator applies.
        sort_cols = [F.col(g).asc_nulls_first() for g in base_fields]
        sort_cols.extend(
            SortElement(g).to_column() for g in group_fields[len(base_fields):]
        )
        if use_source_order:
            sort_cols.append(F.col(SOURCE_ORDER_FIELD).asc())
        sort_cols.extend(e.to_column() for e in self._intra_group_sort_elements())
        n_parts = self._reduce_parallelism(union)
        arranged = union.repartition(
            n_parts, *[F.col(c) for c in base_fields]
        ).sortWithinPartitions(*sort_cols)

        def _boundary_depths(pdf: pd.DataFrame):
            """Vectorized prefix-change detection: for each row, the
            outermost group level that differs from the previous row
            (n_levels = unchanged). Null-safe: two nulls compare equal,
            like the reference comparator."""
            import numpy as np

            depth = np.full(len(pdf), n_levels, dtype=np.int64)
            for j in range(n_levels - 1, -1, -1):
                cur = pdf[group_fields[j]]
                prev = cur.shift(1)
                neq = cur.ne(prev) & ~(cur.isna() & prev.isna())
                depth[neq.to_numpy(copy=False)] = j
            return depth

        def run_partition(batches):
            """Streaming callback walk: only the currently open innermost
            group is buffered — as a LIST of batch views concatenated once
            when the group closes, so the walk stays linear in rows even
            when one group spans many Arrow batches (the old concat-the-
            carry-into-every-batch form copied such a group O(span²)).
            Callbacks fire per GROUP boundary, not per row."""
            import numpy as np

            buf: list[pd.DataFrame] = []
            started = False
            part_counters: dict[str, int] = {}

            def emit_group(collector, last=None):
                """Concat the buffered chunks (once), fire elements; returns
                the group's last row as a dict for the close callbacks.
                ``last`` comes pre-materialized from the batch-level bulk
                ``to_dict('records')`` when the group's final row is local
                to the current batch; only groups whose tail lives in the
                buffer pay a per-group iloc."""
                frame = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
                buf.clear()
                if last is None:
                    last = frame.iloc[len(frame) - 1].to_dict()
                group = {g: last[g] for g in group_fields}
                reducer.on_group_elements(group, frame, collector)
                return last

            def cross_batch_depth(pdf: pd.DataFrame) -> int:
                """Outermost level where batch row 0 differs from the last
                buffered row (n_levels = same group continues)."""
                prev = buf[-1].iloc[len(buf[-1]) - 1]
                row0 = pdf.iloc[0]
                for j, g in enumerate(group_fields):
                    a, b = row0[g], prev[g]
                    if not (a == b or (pd.isna(a) and pd.isna(b))):
                        return j
                return n_levels

            def flush_counters(collector):
                for k, v in collector.counters.items():
                    part_counters[k] = part_counters.get(k, 0) + v

            def walk(pdf: pd.DataFrame):
                nonlocal started
                if not len(pdf):
                    return None
                collector = Collector(allow_named=False)
                depths = _boundary_depths(pdf)
                # row 0 of the first frame opens the partition; on later
                # frames its depth comes from comparing against the
                # buffered open group's last row.
                depths[0] = cross_batch_depth(pdf) if buf else n_levels
                if not started:
                    row0 = pdf.iloc[0].to_dict()
                    for depth in range(min_depth, n_levels):
                        reducer.on_open_group(depth, group_fields[depth], row0, collector)
                    started = True
                # Bulk row materialization: ONE iloc + to_dict('records')
                # for every boundary row and its predecessor, instead of a
                # per-group iloc[i].to_dict() pair — for many-small-groups
                # shapes the per-group pandas row access was the hot spot.
                bidx = np.flatnonzero(depths < n_levels)
                if len(bidx):
                    open_rows = pdf.iloc[bidx].to_dict("records")
                    prev_rows = pdf.iloc[np.maximum(bidx - 1, 0)].to_dict(
                        "records"
                    )
                else:
                    open_rows, prev_rows = [], []
                group_start = 0
                for k, i in enumerate(bidx):
                    i = int(i)
                    if i > group_start:
                        buf.append(pdf.iloc[group_start:i])
                    # the closing group's last row is batch-local (row i-1)
                    # unless the boundary is at row 0 (tail in the buffer)
                    last = emit_group(
                        collector, prev_rows[k] if i > 0 else None
                    )
                    mismatch = max(int(depths[i]), min_depth)
                    for depth in range(n_levels - 1, mismatch - 1, -1):
                        reducer.on_close_group(depth, group_fields[depth], last, collector)
                    row = open_rows[k]
                    for depth in range(mismatch, n_levels):
                        reducer.on_open_group(depth, group_fields[depth], row, collector)
                    group_start = i
                buf.append(pdf.iloc[group_start:])
                flush_counters(collector)
                if collector.rows:
                    return pd.DataFrame(collector.rows, columns=out_columns)
                return None

            for pdf in batches:
                out = walk(pdf)
                if out is not None:
                    yield out
            if buf:
                collector = Collector(allow_named=False)
                last = emit_group(collector)
                for depth in range(n_levels - 1, min_depth - 1, -1):
                    reducer.on_close_group(depth, group_fields[depth], last, collector)
                flush_counters(collector)
                if collector.rows:
                    yield pd.DataFrame(collector.rows, columns=out_columns)
            if part_counters:
                from pyspark import TaskContext

                counter_acc.add({TaskContext.get().partitionId(): part_counters})

        return arranged.mapInPandas(run_partition, schema=out_struct)
