"""User-defined scalar + aggregate functions, reference-compatible.

Reproduces the reference's Python UDF surface
(py-denormalized/python/denormalized/datafusion/udf.py:78-248):

- ``udf(func, input_types, return_type, volatility)`` — ``func``
  receives **pyarrow Arrays** and returns one, exactly as in the
  reference (udf_example.py:31-36). Spark-side it runs as a
  ``pandas_udf``: Arrow batches cross the Python boundary, the
  adapter converts pandas⇄pyarrow per batch (zero-copy for primitive
  types), so the user kernel sees the same Arrays it would under the
  reference. ``Volatility.Volatile`` maps to
  ``.asNondeterministic()`` (udf.py:34-75 volatility semantics —
  Spark's optimizer similarly refuses to collapse nondeterministic
  calls).

- ``udaf(AccumulatorClass, input_types, return_type, state_type,
  volatility)`` — the Accumulator ABC (state/update/merge/evaluate,
  udf.py:146-248; map-typed-state example udaf_example.py:31-66)
  executed via ``applyInPandas``. Each group's rows are split into
  chunks; one accumulator ``update``s per chunk; a final accumulator
  ``merge``s the partial states (per DataFusion's merge_batch
  contract: one Array per state field, one entry per partial) and
  ``evaluate``s. This honors the full partial/merge protocol even
  though a Spark group arrives whole — so an accumulator that
  round-trips here will also be correct under any future
  partial-aggregation execution.

Scale notes: scalar UDFs are Arrow-vectorized (the fast Python path);
still, prefer built-ins — everything in denormalized_spark.functions
stays JVM-side. UDAFs shuffle once on the group key; state lives per
group in one task. For streaming UDAFs over windows, compose with
``window_udaf`` below on the batch side; continuous streaming custom
state belongs to ``applyInPandasWithState``.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from collections.abc import Callable, Sequence
from enum import Enum

import pandas as pd
import pyarrow as pa

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.pandas.types import from_arrow_type
from pyspark.sql import types as T


class Volatility(Enum):
    """Reference volatility semantics (udf.py:34-75)."""

    Immutable = 1
    Stable = 2
    Volatile = 3

    def __str__(self) -> str:
        return self.name.lower()


def _vol_str(v: "Volatility | str") -> str:
    return str(v).lower()


def _pickle_by_value(obj) -> None:
    """Make cloudpickle serialize ``obj``'s defining module by VALUE.

    User kernels/accumulators typically live in scripts or test
    modules that executors cannot import (cloudpickle's default is
    by-reference for module-level definitions). Registering the
    module for by-value pickling ships the code with the task —
    site-packages libraries are skipped (importable everywhere, and
    by-reference keeps the pickle small)."""
    import sys as _sys

    mods = [_sys.modules.get(getattr(obj, "__module__", "") or "")]
    # subclasses of Accumulator also drag in THIS module (the ABC);
    # the engine may not be importable on executors either (driver
    # adds the repo to sys.path, workers don't)
    mods.append(_sys.modules.get(__name__))
    for mod in mods:
        if mod is None or mod.__name__ in ("builtins", "__main__"):
            continue  # __main__ is already pickled by value
        f = getattr(mod, "__file__", None)
        if f and "site-packages" in f:
            continue
        try:
            # Spark serializes tasks with its VENDORED cloudpickle
            from pyspark import cloudpickle
        except ImportError:  # pragma: no cover
            import cloudpickle
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass  # best effort; by-reference may still work


def _as_col(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


class ScalarUDF:
    """Arrow-native scalar UDF (reference ScalarUDF, udf.py:78-143)."""

    def __init__(
        self,
        name: str | None,
        func: Callable[..., pa.Array],
        input_types: Sequence[pa.DataType],
        return_type: pa.DataType,
        volatility: "Volatility | str" = Volatility.Immutable,
    ):
        # last qualname segment: nested defs have dotted qualnames,
        # which are not valid column names
        self.name = name or getattr(func, "__qualname__", "udf").split(".")[-1].lower()
        self._func = func
        self._input_types = list(input_types)
        _pickle_by_value(func)
        spark_ret = from_arrow_type(return_type)
        in_types = self._input_types
        inner = func

        def _impl(*series: pd.Series) -> pd.Series:
            arrays = [
                pa.Array.from_pandas(s, type=t) for s, t in zip(series, in_types)
            ]
            out = inner(*arrays)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            return out.to_pandas()

        # pandas_udf infers the UDF kind from type hints; build a
        # wrapper with the exact arity and Series annotations.
        params = [f"a{i}" for i in range(len(self._input_types))]
        ns: dict = {"_impl": _impl, "pd": pd}
        exec(  # noqa: S102 - controlled codegen of the adapter signature
            f"def _adapter({', '.join(params)}):\n    return _impl({', '.join(params)})",
            ns,
        )
        adapter = ns["_adapter"]
        adapter.__annotations__ = {p: pd.Series for p in params}
        adapter.__annotations__["return"] = pd.Series
        judf = pandas_udf(adapter, returnType=spark_ret)
        if _vol_str(volatility) == "volatile":
            judf = judf.asNondeterministic()
        self._judf = judf

    def __call__(self, *args: Column | str) -> Column:
        return self._judf(*[_as_col(a) for a in args]).alias(self.name)


def udf(
    func: Callable[..., pa.Array],
    input_types: Sequence[pa.DataType],
    return_type: pa.DataType,
    volatility: "Volatility | str" = Volatility.Immutable,
    name: str | None = None,
) -> ScalarUDF:
    """Create a scalar UDF (reference ``udf()``, udf.py:110-143)."""
    if not callable(func):
        raise TypeError("`func` argument must be callable")
    return ScalarUDF(name, func, input_types, return_type, volatility)


class Accumulator(metaclass=ABCMeta):
    """Reference Accumulator ABC (udf.py:146-168)."""

    @abstractmethod
    def state(self) -> list[pa.Scalar]:
        """Current partial state, one pyarrow Scalar per state field."""

    @abstractmethod
    def update(self, values: pa.Array) -> None:
        """Fold a batch of input values into the state."""

    @abstractmethod
    def merge(self, states: list[pa.Array]) -> None:
        """Merge partial states: ``states[i]`` is the i-th state field
        across all partials (DataFusion merge_batch contract)."""

    @abstractmethod
    def evaluate(self) -> pa.Scalar:
        """Final value."""


def _scalar_to_py(value, spark_type):
    """pa.Scalar → Python value in the shape Spark's Arrow writer
    expects (map scalars as_py() to [(k, v), ...]; Spark wants dict) —
    recursively, so map-in-struct states like the reference's
    udaf_example.py:33 round-trip."""
    v = value.as_py() if isinstance(value, pa.Scalar) else value
    return _normalize_maps(v, spark_type)


def _normalize_maps(v, t):
    if v is None:
        return None
    if isinstance(t, T.MapType):
        items = v.items() if isinstance(v, dict) else v
        return {k: _normalize_maps(val, t.valueType) for k, val in items}
    if isinstance(t, T.StructType) and isinstance(v, dict):
        return {f.name: _normalize_maps(v.get(f.name), f.dataType) for f in t.fields}
    if isinstance(t, T.ArrayType) and isinstance(v, list):
        return [_normalize_maps(x, t.elementType) for x in v]
    return v


class AggregateUDF:
    """Accumulator-protocol UDAF executed with applyInPandas
    (reference AggregateUDF, udf.py:171-248)."""

    def __init__(
        self,
        name: str | None,
        accum: type,
        input_types: Sequence[pa.DataType],
        return_type: pa.DataType,
        state_type: Sequence[pa.DataType],
        volatility: "Volatility | str" = Volatility.Immutable,
        chunk_size: int = 4096,
    ):
        if not (isinstance(accum, type) and issubclass(accum, Accumulator)):
            raise TypeError("`accum` must implement the abstract base class Accumulator")
        _pickle_by_value(accum)
        self.name = name or accum.__qualname__.split(".")[-1].lower()
        self.accum = accum
        self.input_types = list(input_types)
        self.return_type = return_type
        self.state_type = list(state_type)
        self.volatility = volatility
        self.chunk_size = chunk_size

    # -- execution ---------------------------------------------------------

    def _fold(self, pdf: pd.DataFrame, input_cols: Sequence[str]):
        """update per chunk → merge partials → evaluate (the full
        reference partial/merge protocol)."""
        accum_cls, in_types, chunk = self.accum, self.input_types, self.chunk_size
        partials = []
        n = len(pdf)
        for lo in range(0, max(n, 1), chunk):
            acc = accum_cls()
            part = pdf.iloc[lo : lo + chunk]
            arrays = [
                pa.Array.from_pandas(part[c], type=t)
                for c, t in zip(input_cols, in_types)
            ]
            acc.update(*arrays)
            partials.append(acc)
        final = accum_cls()
        if partials:
            field_arrays = [
                pa.array(
                    [p.state()[i] for p in partials], type=self.state_type[i]
                )
                for i in range(len(self.state_type))
            ]
            final.merge(field_arrays)
        return final.evaluate()

    def apply(
        self,
        df: DataFrame,
        group_cols: Sequence[str],
        input_cols: Sequence[str] | str,
        alias: str | None = None,
    ) -> DataFrame:
        """Aggregate ``input_cols`` per ``group_cols`` group.

        Plan: one hash shuffle on the group key (applyInPandas), each
        group folded through the Accumulator in a single task.
        """
        input_cols = [input_cols] if isinstance(input_cols, str) else list(input_cols)
        out_name = alias or self.name
        out_schema = T.StructType(
            [df.schema[c] for c in group_cols]
            + [T.StructField(out_name, from_arrow_type(self.return_type))]
        )
        fold = self._fold

        ret_spark_type = from_arrow_type(self.return_type)

        def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            value = fold(pdf, input_cols)
            row = dict(zip(group_cols, key))
            row[out_name] = _scalar_to_py(value, ret_spark_type)
            return pd.DataFrame([row])

        if group_cols:
            return df.groupBy(*group_cols).applyInPandas(kernel, out_schema)
        # global aggregate: single constant group (the reference's
        # global window UDAF path, udaf_example.py:76-83)
        out_schema_g = T.StructType(
            [T.StructField(out_name, from_arrow_type(self.return_type))]
        )

        ret_spark_type = from_arrow_type(self.return_type)

        def kernel_g(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            value = fold(pdf, input_cols)
            return pd.DataFrame([{out_name: _scalar_to_py(value, ret_spark_type)}])

        return (
            df.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(kernel_g, out_schema_g)
        )


def udaf(
    accum: type,
    input_types: Sequence[pa.DataType] | pa.DataType,
    return_type: pa.DataType,
    state_type: Sequence[pa.DataType],
    volatility: "Volatility | str" = Volatility.Immutable,
    name: str | None = None,
) -> AggregateUDF:
    """Create a UDAF (reference ``udaf()``, udf.py:218-248)."""
    if isinstance(input_types, pa.DataType):
        input_types = [input_types]
    return AggregateUDF(name, accum, input_types, return_type, state_type, volatility)


def window_udaf(
    ds,
    udaf_obj: AggregateUDF,
    input_cols: Sequence[str] | str,
    group_exprs: Sequence[str],
    window_length_ms: int,
    slide_ms: int | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Windowed UDAF — the reference's ``ds.window([], [my_udaf(col)],
    len)`` pattern (udaf_example.py:76-83): assign the event-time
    window as a column, then run the Accumulator per (window, keys)
    group."""
    from denormalized_spark.operators.windows import _ms_to_interval, flatten_window

    if ds.event_time is None:
        raise ValueError("window_udaf requires an event-time column")
    slide = _ms_to_interval(slide_ms) if slide_ms else None
    win = F.window(
        F.col(ds.event_time), _ms_to_interval(window_length_ms), slide
    )
    df = ds.df.withColumn("window", win)
    flat = df.withColumn("window_start_time", F.col("window.start")).withColumn(
        "window_end_time", F.col("window.end")
    )
    keys = ["window_start_time", "window_end_time", *group_exprs]
    return udaf_obj.apply(flat, keys, input_cols, alias=alias)
