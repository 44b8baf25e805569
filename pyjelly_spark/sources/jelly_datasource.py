"""``jelly`` as a first-class Spark format via the Python Data Source API.

    spark.dataSource.register(JellyDataSource)          # or register_jelly()
    df = spark.read.format("jelly").load("/data/*.jelly dir")
    df.write.format("jelly").option("frame_rows", 250).save("/out")
    spark.readStream.format("jelly").load("/landing")   # tail a directory
    df.writeStream.format("jelly").start()              # streaming sink

This is the engine's analogue of the reference's format registration
(/root/reference/pyjelly/integrations/rdflib/__init__.py registers Jelly
as an rdflib parser/serializer plugin) — re-expressed as a Spark DSv2
source so the format composes with the whole DataFrame API: predicate
pushdown happens after the scan, partition parallelism is one task per
.jelly file (each stream is self-contained), and writes produce one part
file per input partition with a commit manifest.

Read schema = the canonical flat statements schema of
:mod:`pyjelly_spark.sources.jelly_io` (source_file, frame_id, stmt_idx,
then kind/value/lang/datatype per s/p/o/g slot). The reader yields Arrow
RecordBatches in bounded chunks, so multi-GB streams decode with bounded
worker memory; the writer consumes Arrow batches (DataSourceArrowWriter).

Options (write): ``frame_rows``, ``names``/``prefixes``/``datatypes``
(lookup capacities), ``physical`` in {triples, quads, graphs},
``delimited`` (true/false), ``grouped_by_graph`` (one frame per graph,
GRAPHS/QUADS framing — reference grouped serialize,
integrations/generic/serialize.py:303-350), ``rdf_star``.
"""

from __future__ import annotations

import os
import posixpath
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


#: Where ship_package() materializes the package zip (driver node).
PYFILES_ZIP = "/tmp/pyjelly_spark_pyfiles.zip"


def _ensure_package() -> None:
    """Make ``pyjelly_spark`` importable in whatever Python process runs
    this method.

    Task workers get the package via ``spark-submit --py-files`` /
    ``addPyFile`` (ship_package). The driver-side planner processes that
    PySpark spawns for Python data sources — notably the STREAMING source
    runner — do not receive addPyFile includes (they inherit only the
    JVM's environment), so when the plain import misses we fall back to
    the shipped zip (kept current by ship_package; zip imports work via
    zipimport) or the SparkFiles copy. register_jelly() additionally
    registers this module for cloudpickle by-value pickling so the
    DataSource instance itself unpickles without the package installed.
    """
    try:
        import pyjelly_spark  # noqa: F401

        return
    except ModuleNotFoundError:
        pass
    import sys

    candidates = [PYFILES_ZIP]
    try:
        from pyspark.core.files import SparkFiles

        candidates.append(SparkFiles.get("pyjelly_spark_pyfiles.zip"))
    except Exception:  # SparkFiles root unset in this process
        pass
    for cand in candidates:
        if cand and os.path.exists(cand) and cand not in sys.path:
            sys.path.insert(0, cand)
            try:
                import pyjelly_spark  # noqa: F401

                return
            except ModuleNotFoundError:
                continue
    import pyjelly_spark  # noqa: F401  — surface the real ImportError


def _bool(value: Optional[str], default: bool) -> bool:
    if value is None:
        return default
    return str(value).strip().lower() in ("1", "true", "yes")


_PHYSICAL = {"triples": 1, "quads": 2, "graphs": 3}


def _options_from(options) -> "object":
    """Build StreamOptions from datasource options (defaults = protocol)."""
    _ensure_package()
    from pyjelly_spark.jelly import constants as jc

    physical = _PHYSICAL[str(options.get("physical") or "triples").lower()]
    logical = (
        jc.LOGICAL_FLAT_TRIPLES
        if physical == jc.PHYSICAL_TRIPLES
        else jc.LOGICAL_FLAT_QUADS
    )
    if _bool(options.get("grouped_by_graph"), False):
        logical = (
            jc.LOGICAL_GRAPHS
            if physical == jc.PHYSICAL_TRIPLES
            else jc.LOGICAL_DATASETS
        )
    return jc.StreamOptions(
        physical_type=physical,
        logical_type=logical,
        preset=jc.TablePreset(
            names=int(options.get("names") or jc.DEFAULT_NAMES),
            prefixes=int(options.get("prefixes") or jc.DEFAULT_PREFIXES),
            datatypes=int(options.get("datatypes") or jc.DEFAULT_DATATYPES),
        ),
        stream_name=str(options.get("stream_name") or ""),
        rdf_star=_bool(options.get("rdf_star"), False),
        delimited=_bool(options.get("delimited"), True),
        frame_rows=int(options.get("frame_rows") or jc.DEFAULT_FRAME_ROWS),
    )


class JellyFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class JellyReader(DataSourceReader):
    """Base reader: no ``pushFilters`` override, so it initializes even
    when ``spark.sql.python.filterPushdown.enabled`` is false (PySpark
    refuses to construct a reader that overrides ``pushFilters`` under
    that conf — the round-2 driver gate hit exactly this). The
    partition-pruning fast path lives in :class:`JellyReaderPushdown`;
    ``register_jelly`` picks per-session."""

    def __init__(self, options) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jelly datasource requires a path: .load(<path>)")
        self._file_predicates: List[object] = []

    def _push_filters(self, filters):
        """Partition pruning: ``source_file`` predicates skip whole files.

        Every statement a partition yields has source_file == that
        partition's path, so file-level predicates are decided before a
        single byte decodes. Filters are kept for Spark to re-apply
        (returning them is allowed — pushdown here is pruning, not
        evaluation), so semantics never depend on this fast path.
        """
        from pyspark.sql.datasource import (
            EqualTo,
            In,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )

        for f in filters:
            if isinstance(
                f, (EqualTo, In, StringContains, StringEndsWith, StringStartsWith)
            ) and tuple(f.attribute) == ("source_file",):
                self._file_predicates.append(f)
        return filters

    def pushdown_enabled(self) -> bool:
        return False

    def _keep(self, path: str) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            In,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )

        for f in self._file_predicates:
            if isinstance(f, EqualTo) and path != f.value:
                return False
            if isinstance(f, In) and path not in f.values:
                return False
            if isinstance(f, StringStartsWith) and not path.startswith(f.value):
                return False
            if isinstance(f, StringEndsWith) and not path.endswith(f.value):
                return False
            if isinstance(f, StringContains) and f.value not in path:
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import _jelly_files

        return [
            JellyFilePartition(p)
            for p in _jelly_files(self._path)
            if self._keep(p)
        ]

    def read(self, partition: JellyFilePartition):
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import (
            _decode_bytes_batches,
            _fs_for,
            _fs_read,
        )

        filesystem, fs_path = _fs_for(partition.path)
        data = _fs_read(filesystem, fs_path)
        yield from _decode_bytes_batches(partition.path, data)


class JellyReaderPushdown(JellyReader):
    """The pruning reader: overrides ``pushFilters``, which PySpark only
    allows when ``spark.sql.python.filterPushdown.enabled`` is true.
    ``register_jelly`` enables the conf and selects this class; sessions
    where the conf cannot be enabled get the base reader instead (same
    results, Spark applies the file predicates post-scan)."""

    def pushFilters(self, filters):
        return self._push_filters(filters)

    def pushdown_enabled(self) -> bool:
        return True


class JellyStreamReader(DataSourceStreamReader):
    """Streaming jelly source: tail a directory of ``.jelly`` streams.

    ``spark.readStream.format("jelly").load(dir)`` follows the directory
    as new self-contained stream files appear — e.g. from the streaming
    sink below, from a batch ``write.format("jelly").mode("append")``,
    or from the reference dropping files into a landing zone. The offset
    is the sorted list of member files already visible (the seen-files
    design of Spark's built-in FileStreamSource): a checkpointed restart
    replays exactly the not-yet-committed files, each new file is one
    input partition, and no file is ever decoded twice. Decoding streams
    bounded Arrow chunks, identical to the batch reader.

    Scale note: the offset grows with the member count of ONE directory,
    exactly like the built-in file source's seen-files log — long-lived
    ingest rotates landing directories (the path is any pyarrow-fs URI),
    which keeps each offset list bounded.
    """

    def __init__(self, options) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "jelly datasource requires a path: .load(<path>)"
            )

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import _jelly_files

        return {"files": _jelly_files(self._path)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        seen = set(start.get("files", ()))
        return [
            JellyFilePartition(p)
            for p in end.get("files", ())
            if p not in seen
        ]

    def read(self, partition: JellyFilePartition):
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import (
            _decode_bytes_batches,
            _fs_for,
            _fs_read,
        )

        filesystem, fs_path = _fs_for(partition.path)
        data = _fs_read(filesystem, fs_path)
        yield from _decode_bytes_batches(partition.path, data)

    def commit(self, end: dict) -> None:
        # Source files are the caller's; nothing to clean up.
        pass


@dataclass
class JellyCommit(WriterCommitMessage):
    file: str
    n_statements: int


def _encode_part(
    options: dict, out_dir: str, grouped: bool, iterator, name_prefix: str
) -> JellyCommit:
    """Encode one task's Arrow batches into one .jelly part file."""
    _ensure_package()
    from pyjelly_spark.jelly import constants as jc
    from pyjelly_spark.jelly.encoder import StreamEncoder, delimit
    from pyjelly_spark.sources.jelly_io import _fs_for, _terms_from_arrays

    opts = _options_from(options)
    phys = opts.physical_type
    encoder = StreamEncoder(opts)
    filesystem, base = _fs_for(out_dir)
    filesystem.create_dir(base, recursive=True)
    name = f"{name_prefix}-{uuid.uuid4().hex[:12]}.jelly"
    target = posixpath.join(base, name)
    n_statements = 0
    open_graph: Optional[tuple] = None

    with filesystem.open_output_stream(target) as out:

        def emit(frame: Optional[bytes]) -> None:
            if frame:
                out.write(delimit(frame) if opts.delimited else frame)

        def close_group() -> None:
            nonlocal open_graph
            if open_graph is not None and phys == jc.PHYSICAL_GRAPHS:
                encoder.end_graph()
            if open_graph is not None:
                emit(encoder.take_frame())
            open_graph = None

        for batch in iterator:
            cols = set(batch.schema.names)
            missing = {"s_kind", "p_kind", "o_kind"} - cols
            if missing:
                raise ValueError(
                    f"jelly write needs flat statement columns; missing {missing}"
                )

            def col(name: str):  # Arrow -> python strings, no pandas hop
                return batch.column(name).to_pylist()

            subjects = _terms_from_arrays(
                col("s_kind"), col("s_value"), col("s_lang"), col("s_datatype")
            )
            predicates = _terms_from_arrays(
                col("p_kind"), col("p_value"), col("p_lang"), col("p_datatype")
            )
            objects = _terms_from_arrays(
                col("o_kind"), col("o_value"), col("o_lang"), col("o_datatype")
            )
            graphs: Optional[List[tuple]] = None
            if "g_kind" in cols and (grouped or phys != jc.PHYSICAL_TRIPLES):
                kinds = [k if k is not None else "dg" for k in col("g_kind")]
                graphs = _terms_from_arrays(
                    kinds, col("g_value"), col("g_lang"), col("g_datatype")
                )
            if grouped and graphs is not None:
                for s, p, o, g in zip(subjects, predicates, objects, graphs):
                    if g != open_graph:
                        close_group()
                        if phys == jc.PHYSICAL_GRAPHS:
                            encoder.begin_graph(g)
                        open_graph = g
                    if phys == jc.PHYSICAL_QUADS:
                        encoder.add_quad(s, p, o, g)
                    else:
                        encoder.add_triple(s, p, o)
            elif phys == jc.PHYSICAL_QUADS and graphs is not None:
                for s, p, o, g in zip(subjects, predicates, objects, graphs):
                    emit(encoder.add_quad(s, p, o, g))
            else:
                for s, p, o in zip(subjects, predicates, objects):
                    emit(encoder.add_triple(s, p, o))
            n_statements += len(subjects)
        close_group()
        emit(encoder.take_frame())
    return JellyCommit(file=target, n_statements=n_statements)


def _write_manifest(out_dir: str, messages, manifest_name: str) -> None:
    import json
    _ensure_package()

    from pyjelly_spark.sources.jelly_io import _fs_for, _fs_write

    filesystem, base = _fs_for(out_dir)
    manifest_dir = posixpath.join(base, "_manifest")
    filesystem.create_dir(manifest_dir, recursive=True)
    entries = [
        {"file": m.file, "n_statements": m.n_statements}
        for m in messages
        if m is not None
    ]
    _fs_write(
        filesystem,
        posixpath.join(manifest_dir, manifest_name),
        json.dumps(entries, indent=1).encode("utf-8"),
    )


class JellyWriter(DataSourceArrowWriter):
    """One .jelly part file per input partition + a _manifest entry."""

    def __init__(self, options, overwrite: bool) -> None:
        self._out = options.get("path")
        if not self._out:
            raise ValueError("jelly datasource requires a path: .save(<path>)")
        self._options = dict(options)
        self._grouped = _bool(options.get("grouped_by_graph"), False)
        if overwrite:
            _ensure_package()
            from pyjelly_spark.sources.jelly_io import _fs_for, _fs_isdir

            filesystem, base = _fs_for(self._out)
            if _fs_isdir(filesystem, base):
                filesystem.delete_dir_contents(base)

    def write(self, iterator) -> JellyCommit:
        return _encode_part(
            self._options, self._out, self._grouped, iterator, "part"
        )

    def commit(self, messages) -> None:
        _write_manifest(self._out, messages, "datasource.json")

    def abort(self, messages) -> None:
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import _fs_for

        filesystem, _base = _fs_for(self._out)
        for m in messages:
            if m is not None:
                try:
                    filesystem.delete_file(m.file)
                except OSError:
                    pass


class JellyStreamWriter(DataSourceStreamArrowWriter):
    """Streaming jelly sink: one part file per microbatch partition.

    Each microbatch commits a ``_manifest/batch-<id>.json``; part files
    are named ``stream-<uuid>.jelly`` so a crashed, retried batch never
    collides (orphans from failed tasks are deleted in ``abort``). Jelly
    streams are self-contained per file, so any reader (``read_jelly``,
    the batch format reader, the reference) can consume the directory as
    it grows.
    """

    def __init__(self, options) -> None:
        self._out = options.get("path")
        if not self._out:
            raise ValueError("jelly datasource requires a path")
        self._options = dict(options)
        self._grouped = _bool(options.get("grouped_by_graph"), False)

    def write(self, iterator) -> JellyCommit:
        return _encode_part(
            self._options, self._out, self._grouped, iterator, "stream"
        )

    def commit(self, messages, batchId: int) -> None:
        _write_manifest(self._out, messages, f"batch-{batchId}.json")

    def abort(self, messages, batchId: int) -> None:
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import _fs_for

        filesystem, _base = _fs_for(self._out)
        for m in messages:
            if m is not None:
                try:
                    filesystem.delete_file(m.file)
                except OSError:
                    pass


class JellyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jelly"

    def schema(self) -> StructType:
        _ensure_package()
        from pyjelly_spark.sources.jelly_io import READ_SCHEMA

        return READ_SCHEMA

    def reader(self, schema: StructType) -> JellyReader:
        return JellyReader(self.options)

    def streamReader(self, schema: StructType) -> JellyStreamReader:
        return JellyStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JellyWriter:
        return JellyWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JellyStreamWriter(self.options)


class JellyDataSourcePushdown(JellyDataSource):
    """Variant whose reader prunes partitions via ``pushFilters``.

    Registered by :func:`register_jelly` only after it has successfully
    enabled ``spark.sql.python.filterPushdown.enabled`` on the session —
    PySpark refuses to initialize a pushFilters-overriding reader while
    that conf is false (the exact failure the round-2 driver session
    hit, since the driver does not use this repo's session builder)."""

    def reader(self, schema: StructType) -> JellyReader:
        return JellyReaderPushdown(self.options)


def register_jelly(spark, pushdown: "bool | None" = None) -> None:
    """Register the format (and ship the package to python workers).

    ``pushdown``:

    * ``None`` (default) — enable ``spark.sql.python.filterPushdown.
      enabled`` on the session and register the partition-pruning
      reader; fall back to the plain reader if the conf cannot be set.
    * ``False`` — register the plain (no-pushFilters) reader and leave
      the session conf untouched. Use this when other code on the
      session needs that conf to stay false.
    * ``True`` — require the pruning reader; raises if the conf cannot
      be enabled.

    NOTE the conf dependency is *per read*, not per registration:
    PySpark re-checks ``spark.sql.python.filterPushdown.enabled`` every
    time it plans a scan of a pushFilters-overriding reader, so if user
    code flips the conf off *after* ``register_jelly(spark)``, later
    ``spark.read.format("jelly")`` calls fail with PySpark's
    DATA_SOURCE_PUSHDOWN_DISABLED error (there is no reader-side hook
    to fall back — the gate lives in PySpark's plan worker). Remedy:
    re-enable the conf, or call ``register_jelly(spark,
    pushdown=False)`` to re-register the plain variant. Results are
    identical either way; without pushdown Spark applies source_file
    predicates after the scan instead of pruning files inside it.

    Besides ``addPyFile`` shipping (task workers), this module is
    registered for cloudpickle BY-VALUE pickling: PySpark's driver-side
    streaming source runner unpickles the DataSource in a bare Python
    process that gets neither addPyFile includes nor the driver's
    ``sys.path``, so the class definition must travel inside the pickle
    itself (methods then bootstrap their imports via _ensure_package).
    Under ``spark-submit --py-files`` (the cluster deployment, BASELINE
    north_rule) the runner inherits PYTHONPATH and none of this is
    needed — it makes programmatically-built sessions behave the same.
    """
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: --py-files / PYTHONPATH paths still work
    # The pruning reader needs python filterPushdown enabled; the conf is
    # runtime-settable, so enable it here rather than assuming the session
    # came from this repo's builder. If it cannot be enabled (locked conf,
    # future default change), register the no-pushdown reader — identical
    # results, Spark applies source_file predicates after the scan.
    if pushdown is False:
        spark.dataSource.register(JellyDataSource)
        return
    enabled = False
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        enabled = (
            str(
                spark.conf.get("spark.sql.python.filterPushdown.enabled")
            ).lower()
            == "true"
        )
    except Exception:
        enabled = False
    if pushdown is True and not enabled:
        raise RuntimeError(
            "register_jelly(pushdown=True): could not enable "
            "spark.sql.python.filterPushdown.enabled on this session"
        )
    spark.dataSource.register(
        JellyDataSourcePushdown if enabled else JellyDataSource
    )
