"""Spark <-> Jelly boundary: distributed .jelly writer and reader.

Write side: one Spark partition == one independent Jelly stream (its own
options row + lookup tables), mirroring one pyjelly ``Stream`` instance
per output (/root/reference/pyjelly/serialize/streams.py:48-67). The
encoder is inherently sequential per stream, so it lives inside a single
``mapInPandas`` pass — the sanctioned escape hatch — while everything
upstream stays declarative. Frames are written incrementally (constant
memory per partition, like the reference's bounded flows).

Two framing modes:
- flat (default): bounded frames of ``frame_rows`` stream rows;
- ``grouped_by_graph``: one frame per consecutive same-graph run — the
  distributed analogue of the reference's grouped serialization
  (``split_to_graphs`` + frame-per-graph flows,
  /root/reference/pyjelly/integrations/generic/serialize.py:234-330).
  The caller owns ordering: sortWithinPartitions on the graph key makes
  runs == graphs.

Each partition also emits a manifest row (statement/frame/byte counts,
stream sha256, repo range) — the per-partition lineage that makes the
job checkpoint-resumable: a rerun skips partitions whose manifest entry
exists and whose file sha still matches.

Read side: a listing of .jelly files fans out over executors; each file
decodes independently (streams are self-contained by construction) and
yields bounded Arrow chunks (constant worker memory for multi-GB
streams). Every statement carries its ``frame_id``, so grouped streams
are recovered by grouping on (source_file, frame_id) — the distributed
analogue of ``parse_jelly_grouped`` (one group per frame,
/root/reference/pyjelly/integrations/generic/parse.py:230-317).

All file I/O goes through ``pyarrow.fs`` resolved from the path's URI
scheme, so the same code runs against local disk (bare paths or
``file://``), HDFS, or object stores on a real cluster — no executor
assumes the driver's filesystem.
"""

from __future__ import annotations

import hashlib
import json
import posixpath
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyjelly_spark.jelly import constants as jc
from pyjelly_spark.jelly.decoder import StreamDecoder, split_frame
from pyjelly_spark.jelly.encoder import StreamEncoder, delimit
from pyjelly_spark.jelly.grouped import grouped_options
from pyjelly_spark.jelly.ioutils import frames_from_bytes

# ---------------------------------------------------------------------------
# Filesystem abstraction (cluster-portable I/O)
# ---------------------------------------------------------------------------


def _fs_for(path: str):
    """Resolve a path or URI to (pyarrow FileSystem, fs-local path).

    Bare paths map to the local filesystem; ``file://``, ``hdfs://``,
    ``s3://`` etc. resolve via ``pyarrow.fs.FileSystem.from_uri`` — the
    executor-side code never touches ``open()``/``os`` directly, so it
    works when executors do not share the driver's disk.
    """
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _fs_exists(filesystem, path: str) -> bool:
    from pyarrow import fs as pafs

    return filesystem.get_file_info(path).type != pafs.FileType.NotFound


def _fs_isdir(filesystem, path: str) -> bool:
    from pyarrow import fs as pafs

    return filesystem.get_file_info(path).type == pafs.FileType.Directory


def _fs_listdir(
    filesystem, path: str, recursive: bool = False
) -> List[str]:
    from pyarrow import fs as pafs

    if not _fs_isdir(filesystem, path):
        return []
    return [
        info.path
        for info in filesystem.get_file_info(
            pafs.FileSelector(path, recursive=recursive)
        )
    ]


def _fs_read(filesystem, path: str) -> bytes:
    with filesystem.open_input_stream(path) as handle:
        return handle.read()


def _fs_write(filesystem, path: str, data: bytes) -> None:
    with filesystem.open_output_stream(path) as handle:
        handle.write(data)


MANIFEST_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("file", StringType(), False),
        StructField("n_statements", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("stream_sha256", StringType(), False),
        StructField("repo_min", StringType(), True),
        StructField("repo_max", StringType(), True),
        StructField("skipped", IntegerType(), False),
    ]
)

_TERM_COLS = ("kind", "value", "lang", "datatype")


def flatten_terms(df: DataFrame, slots: Tuple[str, ...] = ("s", "p", "o")) -> DataFrame:
    """Term structs -> flat string columns (fast Arrow string arrays)."""
    cols = [c for c in df.columns if c not in slots]
    flat = [F.col(c) for c in cols]
    for slot in slots:
        for part in _TERM_COLS:
            flat.append(F.col(f"{slot}.{part}").alias(f"{slot}_{part}"))
    return df.select(*flat)


def _terms_from_arrays(kinds, values, langs, datatypes) -> List[tuple]:
    """Vector-ish tuple construction for one slot of one Arrow batch.

    RDF-star convention: kind ``qt`` carries the quoted triple as its
    N-Triples serialization (``<< <s> <p> <o> >>``, nesting allowed) in
    the value column — parsed back to a term tuple here.
    """
    from pyjelly_spark.jelly.nt import parse_term

    # Homogeneous-slot fast paths: predicates are always IRIs and
    # subjects almost always are, so one vectorized kind check replaces
    # the per-row branch ladder for most batches.
    def _uniform(kind: str) -> bool:
        eq = kinds == kind  # ndarray (Arrow batches) or scalar (lists)
        return eq.all() if hasattr(eq, "all") else all(k == kind for k in kinds)

    if len(kinds):
        first = kinds[0]
        if first == "iri" and _uniform("iri"):
            return [("iri", v) for v in values]
        if first == "lit" and _uniform("lit"):
            return [
                ("lit", v, lg or "", dt or "")
                for v, lg, dt in zip(values, langs, datatypes)
            ]
    out = []
    append = out.append
    for kind, value, lang, datatype in zip(kinds, values, langs, datatypes):
        if kind == "iri":
            append(("iri", value))
        elif kind == "lit":
            append(("lit", value, lang or "", datatype or ""))
        elif kind == "bnode":
            append(("bnode", value))
        elif kind == "qt":
            append(parse_term(value))
        else:
            append(("dg",))
    return out


def manifest_path(out_dir: str) -> str:
    return posixpath.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict:
    """partition_id -> manifest dict for all completed partitions."""
    filesystem, base = _fs_for(out_dir)
    entries = {}
    for path in _fs_listdir(filesystem, posixpath.join(base, "_manifest")):
        if path.endswith(".json"):
            entry = json.loads(_fs_read(filesystem, path))
            entries[entry["partition_id"]] = entry
    return entries


def _completed_partition_ids(out_dir: str) -> set:
    """Partitions safely resumable: manifest present and file sha matches."""
    filesystem, _base = _fs_for(out_dir)
    done = set()
    for pid, entry in load_manifest(out_dir).items():
        path = entry["file"]
        if not _fs_exists(filesystem, path):
            continue
        digest = hashlib.sha256()
        with filesystem.open_input_stream(path) as handle:
            for chunk in iter(lambda: handle.read(1 << 20), b""):
                digest.update(chunk)
        if digest.hexdigest() == entry["stream_sha256"]:
            done.add(pid)
    return done


def _options_to_dict(options: jc.StreamOptions) -> dict:
    return {
        "physical_type": options.physical_type,
        "logical_type": options.logical_type,
        "names": options.preset.names,
        "prefixes": options.preset.prefixes,
        "datatypes": options.preset.datatypes,
        "frame_rows": options.frame_rows,
        "stream_name": options.stream_name,
        "generalized": options.generalized,
        "rdf_star": options.rdf_star,
        "namespace_declarations": options.namespace_declarations,
        "delimited": options.delimited,
    }


def _options_from_dict(d: dict) -> jc.StreamOptions:
    return jc.StreamOptions(
        physical_type=d["physical_type"],
        logical_type=d["logical_type"],
        preset=jc.TablePreset(d["names"], d["prefixes"], d["datatypes"]),
        frame_rows=d["frame_rows"],
        stream_name=d["stream_name"],
        generalized=d["generalized"],
        rdf_star=d["rdf_star"],
        namespace_declarations=d["namespace_declarations"],
        delimited=d["delimited"],
    )


def guess_options(
    flat_statements: DataFrame, grouped_by_graph: bool = False
) -> jc.StreamOptions:
    """Arity-based option guessing, mirroring the reference's
    ``guess_options`` (/root/reference/pyjelly/integrations/generic/serialize.py:266-277):
    the SINK SHAPE decides — a statements frame carrying graph-slot
    columns gets a quads stream (flat: PHYSICAL_QUADS/FLAT_QUADS; grouped:
    PHYSICAL_GRAPHS/NAMED_GRAPHS), one without gets a triples stream.
    Content is not inspected (same as the reference, which keys on the
    sink type, not the data)."""
    has_graph_slot = "g_kind" in flat_statements.columns
    if grouped_by_graph:
        if not has_graph_slot:
            raise jc.JellyError(
                "grouped_by_graph guessing needs g_* graph-slot columns"
            )
        return grouped_options(jc.PHYSICAL_GRAPHS)
    if has_graph_slot:
        return jc.StreamOptions(
            physical_type=jc.PHYSICAL_QUADS, logical_type=jc.LOGICAL_FLAT_QUADS
        )
    return jc.StreamOptions()


_NO_GRAPH = ("\x00no-graph",)  # sentinel distinct from any real term


def write_jelly(
    flat_statements: DataFrame,
    out_dir: str,
    options: Optional[jc.StreamOptions] = None,
    resume: bool = True,
    grouped_by_graph: bool = False,
    namespaces: Optional[dict] = None,
) -> pd.DataFrame:
    """Write pre-partitioned, pre-sorted flat statements as .jelly files.

    ``flat_statements`` must already carry s_/p_/o_ (and g_ for quads /
    grouped mode) flattened term columns in final statement order per
    partition (the caller owns partitioning — see
    pipeline.plan_partitions). Returns the manifest as pandas.

    ``grouped_by_graph=True`` emits one frame per consecutive same-graph
    run (the distributed `split_to_graphs`): physical GRAPHS brackets each
    run with graph_start/end rows, physical QUADS re-attaches the graph
    term per statement, physical TRIPLES drops it (logical grouping only).

    ``namespaces`` (label -> IRI) are declared once at the head of every
    partition stream (protocol v2 rows); requires options with
    ``namespace_declarations=True`` (the default options get it
    automatically when namespaces are passed).

    This is an action: it runs the job and persists manifest entries.
    """
    from pyjelly_spark.session import ship_package

    ship_package(flat_statements.sparkSession)
    if options is None:
        options = guess_options(flat_statements, grouped_by_graph)
        if namespaces:
            import dataclasses

            options = dataclasses.replace(options, namespace_declarations=True)
    if namespaces and not options.namespace_declarations:
        raise jc.JellyError(
            "namespaces require options.namespace_declarations=True (v2)"
        )
    if grouped_by_graph and options.delimited and (
        options.logical_type % 10
        in (jc.LOGICAL_UNSPECIFIED, jc.LOGICAL_FLAT_TRIPLES, jc.LOGICAL_FLAT_QUADS)
    ):
        raise jc.JellyError(
            "grouped_by_graph needs a grouped logical type (GRAPHS/DATASETS "
            "family) — flat logical types use bounded framing, which would "
            "split graphs across frames"
        )
    if not options.delimited and grouped_by_graph:
        raise jc.JellyError(
            "non-delimited streams hold exactly ONE frame "
            "(/root/reference/pyjelly/serialize/flows.py ManualFrameFlow); "
            "grouped_by_graph emits one frame per graph"
        )
    filesystem, base = _fs_for(out_dir)
    filesystem.create_dir(base, recursive=True)
    filesystem.create_dir(posixpath.join(base, "_manifest"), recursive=True)
    skip_ids = _completed_partition_ids(out_dir) if resume else set()
    opts_dict = _options_to_dict(options)
    ns_items = sorted((namespaces or {}).items())

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid in skip_ids:
            for _ in batches:
                pass
            return
        stream_options = _options_from_dict(opts_dict)
        part_fs, part_base = _fs_for(out_dir)
        encoder = StreamEncoder(stream_options)
        phys = stream_options.physical_type
        path = posixpath.join(part_base, f"part-{pid:05d}.jelly")
        tmp_path = path + ".inprogress"
        digest = hashlib.sha256()
        n_statements = n_frames = n_bytes = 0
        repo_min = repo_max = None
        open_graph: object = _NO_GRAPH
        add_triple = encoder.add_triple
        add_quad = encoder.add_quad
        sink = part_fs.open_output_stream(tmp_path)
        try:

            delimited = stream_options.delimited

            def emit(frame: bytes) -> None:
                nonlocal n_frames, n_bytes
                chunk = delimit(frame) if delimited else frame
                if not delimited and n_frames:
                    raise jc.JellyError(
                        "non-delimited partition stream produced a second "
                        "frame — statements exceed one frame's worth"
                    )
                sink.write(chunk)
                digest.update(chunk)
                n_frames += 1
                n_bytes += len(chunk)

            def close_group() -> None:
                nonlocal open_graph
                if open_graph is _NO_GRAPH:
                    return
                if phys == jc.PHYSICAL_GRAPHS:
                    encoder.end_graph()
                frame = encoder.take_frame()
                if frame is not None:
                    emit(frame)
                open_graph = _NO_GRAPH

            for label, iri in ns_items:
                encoder.declare_namespace(label, iri)

            for batch in batches:
                subjects = _terms_from_arrays(
                    batch["s_kind"].values,
                    batch["s_value"].values,
                    batch["s_lang"].values,
                    batch["s_datatype"].values,
                )
                predicates = _terms_from_arrays(
                    batch["p_kind"].values,
                    batch["p_value"].values,
                    batch["p_lang"].values,
                    batch["p_datatype"].values,
                )
                objects = _terms_from_arrays(
                    batch["o_kind"].values,
                    batch["o_value"].values,
                    batch["o_lang"].values,
                    batch["o_datatype"].values,
                )
                if "repo" in batch.columns and len(batch):
                    lo = batch["repo"].min()
                    hi = batch["repo"].max()
                    repo_min = lo if repo_min is None else min(repo_min, lo)
                    repo_max = hi if repo_max is None else max(repo_max, hi)
                needs_graph = grouped_by_graph or phys == jc.PHYSICAL_QUADS
                if needs_graph:
                    graphs = _terms_from_arrays(
                        batch["g_kind"].values,
                        batch["g_value"].values,
                        batch["g_lang"].values,
                        batch["g_datatype"].values,
                    )
                if grouped_by_graph:
                    for s, p, o, g in zip(subjects, predicates, objects, graphs):
                        if g != open_graph:
                            close_group()
                            if phys == jc.PHYSICAL_GRAPHS:
                                encoder.begin_graph(g)
                            open_graph = g
                        if phys == jc.PHYSICAL_QUADS:
                            add_quad(s, p, o, g)
                        else:
                            add_triple(s, p, o)
                elif phys == jc.PHYSICAL_QUADS:
                    for s, p, o, g in zip(subjects, predicates, objects, graphs):
                        frame = add_quad(s, p, o, g)
                        if frame is not None:
                            emit(frame)
                else:
                    for s, p, o in zip(subjects, predicates, objects):
                        frame = add_triple(s, p, o)
                        if frame is not None:
                            emit(frame)
                n_statements += len(subjects)
            close_group()
            if n_statements:
                tail = encoder.take_frame(
                    metadata={"partition": str(pid).encode("ascii")}
                )
                if tail is not None:
                    emit(tail)
        finally:
            sink.close()
        if n_statements == 0:
            part_fs.delete_file(tmp_path)
            return
        part_fs.move(tmp_path, path)
        entry = {
            "partition_id": pid,
            "file": path,
            "n_statements": n_statements,
            "n_frames": n_frames,
            "n_bytes": n_bytes,
            "stream_sha256": digest.hexdigest(),
            "repo_min": repo_min,
            "repo_max": repo_max,
            "skipped": 0,
        }
        _fs_write(
            part_fs,
            posixpath.join(part_base, "_manifest", f"part-{pid:05d}.json"),
            json.dumps(entry).encode("utf-8"),
        )
        yield pd.DataFrame([entry])

    manifest_df = flat_statements.mapInPandas(write_partition, schema=MANIFEST_SCHEMA)
    written = manifest_df.toPandas()
    # merge with previously-completed (skipped) partitions for a full view
    previous = [
        {**entry, "skipped": 1}
        for pid, entry in load_manifest(out_dir).items()
        if pid in skip_ids
    ]
    if previous:
        written = pd.concat([written, pd.DataFrame(previous)], ignore_index=True)
    return written.sort_values("partition_id").reset_index(drop=True)


READ_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), False),
        StructField("frame_id", LongType(), False),
        StructField("stmt_idx", LongType(), False),
        StructField("s_kind", StringType(), False),
        StructField("s_value", StringType(), True),
        StructField("s_lang", StringType(), True),
        StructField("s_datatype", StringType(), True),
        StructField("p_kind", StringType(), False),
        StructField("p_value", StringType(), True),
        StructField("p_lang", StringType(), True),
        StructField("p_datatype", StringType(), True),
        StructField("o_kind", StringType(), False),
        StructField("o_value", StringType(), True),
        StructField("o_lang", StringType(), True),
        StructField("o_datatype", StringType(), True),
        StructField("g_kind", StringType(), True),
        StructField("g_value", StringType(), True),
        StructField("g_lang", StringType(), True),
        StructField("g_datatype", StringType(), True),
    ]
)

_READ_COLS = [f.name for f in READ_SCHEMA]
_DECODE_CHUNK_ROWS = 65536  # bounded worker memory for multi-GB streams


def _term_cols(term: Optional[tuple]) -> Tuple[Optional[str], ...]:
    if term is None:
        return (None, None, None, None)
    kind = term[0]
    if kind == "lit":
        return ("lit", term[1], term[2], term[3])
    if kind == "dg":
        return ("dg", None, None, None)
    if kind == "qt":
        from pyjelly_spark.jelly.nt import term_to_nt

        return ("qt", term_to_nt(term), None, None)
    return (kind, term[1], None, None)


def _jelly_files(path: str) -> List[str]:
    """Expand a path/URI to the list of .jelly member paths (URIs kept)."""
    filesystem, base = _fs_for(path)
    prefix = path[: -len(base)] if path.endswith(base) and path != base else ""
    if _fs_isdir(filesystem, base):
        # recursive: a streaming sink lays out batch=<id>/part-*.jelly
        # subdirectories; the batch reader sees the union transparently
        return sorted(
            prefix + p
            for p in _fs_listdir(filesystem, base, recursive=True)
            if p.endswith(".jelly")
        )
    return [path]


def _paths_df(spark: SparkSession, files: List[str]) -> DataFrame:
    df = spark.createDataFrame([(f,) for f in files], "source_file: string")
    return df.repartition(max(len(files), 1))


def _push_term(term, kinds, values, langs, datatypes) -> None:
    """Append one term's 4 flat columns (columnar dual of _term_cols)."""
    if term is None:
        kinds.append(None)
        values.append(None)
        langs.append(None)
        datatypes.append(None)
        return
    kind = term[0]
    if kind == "lit":
        kinds.append("lit")
        values.append(term[1])
        langs.append(term[2])
        datatypes.append(term[3])
        return
    langs.append(None)
    datatypes.append(None)
    if kind == "dg":
        kinds.append("dg")
        values.append(None)
    elif kind == "qt":
        from pyjelly_spark.jelly.nt import term_to_nt

        kinds.append("qt")
        values.append(term_to_nt(term))
    else:
        kinds.append(kind)
        values.append(term[1])


def _arrow_read_schema():
    import pyarrow as pa

    return pa.schema(
        [pa.field("source_file", pa.string(), nullable=False)]
        + [pa.field(n, pa.int64(), nullable=False) for n in ("frame_id", "stmt_idx")]
        + [pa.field(n, pa.string()) for n in _READ_COLS[3:]]
    )


def _decode_bytes_batches(
    source: str,
    data: bytes,
    logical_type_strict: Optional[str] = None,
    frame_id_offset: int = 0,
):
    """Decode one self-contained Jelly stream into bounded Arrow
    RecordBatches of flat statement rows (with frame_id / stmt_idx).

    Columnar construction: 19 python lists -> pa.array (C conversion),
    never a row-tuple list — the statement decode itself is the only
    per-row Python left on the read path.

    ``logical_type_strict``: None (accept any), "flat", or "grouped" —
    the reference's strict logical-type gate, applied per file as soon
    as its options row decodes.

    ``frame_id_offset`` shifts emitted frame_ids: segment decoding
    (read_jelly's split_foreign_files) passes the segment's first
    frame index so frame_ids stay file-global across segments.
    """
    import pyarrow as pa

    schema = _arrow_read_schema()
    decoder = StreamDecoder()
    lt_checked = logical_type_strict is None
    current_graph: Optional[tuple] = None
    frame_ids: List[int] = []
    cols: List[List] = [[] for _ in range(16)]
    (sk, sv, sl, sd, pk, pv, pl, pd_, ok, ov, ol, od, gk, gv, gl, gd) = cols
    chunk_start = 0

    def flush():
        nonlocal chunk_start
        n = len(frame_ids)
        arrays = [
            pa.array([source] * n, pa.string()),
            pa.array(frame_ids, pa.int64()),
            pa.array(range(chunk_start, chunk_start + n), pa.int64()),
        ] + [pa.array(col, pa.string()) for col in cols]
        chunk_start += n
        frame_ids.clear()
        for col in cols:
            col.clear()
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    for frame_id, frame in enumerate(frames_from_bytes(data), start=frame_id_offset):
        frame_rows, _meta = split_frame(frame)
        for row in frame_rows:
            event = decoder.decode_row(row)
            if not lt_checked and decoder.options is not None:
                jc.check_logical_type_strict(
                    decoder.options, logical_type_strict
                )
                lt_checked = True
            if event is None:
                continue
            kind = event[0]
            if kind == "triple":
                s, p, o = event[1], event[2], event[3]
                graph = current_graph
            elif kind == "quad":
                s, p, o, graph = event[1], event[2], event[3], event[4]
            elif kind == "graph_start":
                current_graph = event[1]
                continue
            elif kind == "graph_end":
                current_graph = None
                continue
            else:  # namespace rows: surfaced by read_jelly_namespaces
                continue
            frame_ids.append(frame_id)
            _push_term(s, sk, sv, sl, sd)
            _push_term(p, pk, pv, pl, pd_)
            _push_term(o, ok, ov, ol, od)
            _push_term(graph, gk, gv, gl, gd)
            if len(frame_ids) >= _DECODE_CHUNK_ROWS:
                yield flush()
    if not lt_checked:
        # Stream ended without an options row (e.g. empty/options-less
        # file): strict mode rejects it, matching decode_flat /
        # decode_grouped end-of-stream behavior.
        jc.check_logical_type_strict(decoder.options, logical_type_strict)
    if frame_ids:
        yield flush()


def _decode_bytes_chunked(source: str, data: bytes) -> Iterator[pd.DataFrame]:
    """Pandas view of _decode_bytes_batches (for pandas consumers)."""
    for batch in _decode_bytes_batches(source, data):
        yield batch.to_pandas()


def read_jelly(
    spark: SparkSession,
    path: str,
    logical_type_strict: Optional[str] = None,
    split_foreign_files: bool = False,
) -> DataFrame:
    """Read .jelly file(s) into a flat statements DataFrame.

    Parallelism = one task per file; each Jelly stream is self-contained
    so files decode independently across executors. Output carries
    ``frame_id``: for grouped streams (one graph/dataset per frame) a
    ``groupBy(source_file, frame_id)`` recovers the groups — the
    distributed ``parse_jelly_grouped``. GRAPHS brackets are resolved to
    quads with the bracketing graph term.

    STRAGGLER CONTRACT (one task per file): intra-file parallelism is
    impossible for a single Jelly stream because the prefix/name/
    datatype lookup tables accumulate SEQUENTIALLY across frames — a
    frame in the middle of a foreign file can reference table entries
    declared gigabytes earlier, so a split task would need the full
    prefix replayed anyway (the frame seek index in
    ``ioutils.build_frame_index`` gives random access to frame BYTES,
    not to decoder STATE). Files written by this repo are immune: the writers
    bound each output stream at ``rows_per_stream`` (default 200k)
    statements, so task skew is capped by construction. For FOREIGN
    multi-GB single-stream files, the decode wall is the one file's
    sequential decode (~165k stmts/s/core pure-Python) regardless of
    cluster size — mitigate by re-sharding once through
    ``read_jelly -> write_jelly`` (bounded streams out), after which
    every later read scales with file count. This matches the
    reference's own contract: its parsers are single-stream sequential
    too (parse.py); no Jelly implementation can split lookup state.

    ``split_foreign_files=True`` declares CONCATENATION SEMANTICS and
    recovers intra-file parallelism from it: each options-headed frame
    is treated as the start of an independent stream
    (``ioutils.scan_stream_segments``), so a concatenated object
    (``cat a.jelly b.jelly`` — the object-store append pattern)
    decodes as byte-range segments, one task each, with FRESH decoder
    state per segment. For that shape this is also the only CORRECT
    read: a sequential decoder carries stream A's lookup tables and
    auto-increment counters into stream B and silently resolves B's
    references against them — every Jelly implementation including the
    reference mis-decodes concatenations (the reference
    validates-and-continues on repeated options rows,
    parse/decode.py:259-267, which serves the OTHER shape: one
    continuing stream re-emitting its options mid-stream; for such
    streams keep this flag off, the two shapes are
    byte-indistinguishable and the caller must declare). Mechanics: a
    cheap distributed pre-pass walks only the varint framing (no term
    decode), then segments shuffle across the cluster and decode in
    parallel; frame_id stays file-global (segment frame offsets are
    carried through), stmt_idx restarts per segment — order by
    (source_file, frame_id, stmt_idx), total either way.
    Single-encoder files collapse to one segment and decode exactly as
    the default path, at the cost of one extra framing walk per file.

    ``logical_type_strict``: None (default, route by physical type
    only), "flat", or "grouped" — the reference's strict gate
    (/root/reference/pyjelly/integrations/generic/parse.py:234-263):
    each file's DECLARED logical type must match or the decoding task
    raises JellyError. Use "grouped" when downstream consumes
    ``(source_file, frame_id)`` groups, "flat" when it treats the rows
    as one statement stream.
    """
    if logical_type_strict not in (None, "flat", "grouped"):
        raise ValueError(
            "logical_type_strict must be None, 'flat' or 'grouped'"
        )
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    paths_df = _paths_df(spark, _jelly_files(path))

    if split_foreign_files:
        return _read_jelly_split(spark, paths_df, logical_type_strict)

    def decode_files(batches):
        for batch in batches:
            for source in batch.column("source_file").to_pylist():
                filesystem, fs_path = _fs_for(source)
                yield from _decode_bytes_batches(
                    source,
                    _fs_read(filesystem, fs_path),
                    logical_type_strict,
                )

    # mapInArrow: RecordBatches flow straight from the decoder's columnar
    # builders to the JVM; no pandas materialization on the read path
    return paths_df.mapInArrow(decode_files, schema=READ_SCHEMA)


def _read_jelly_split(
    spark: SparkSession,
    paths_df: DataFrame,
    logical_type_strict: Optional[str],
) -> DataFrame:
    """Two-stage segment-parallel decode (read_jelly split_foreign_files).

    Stage 1 (one task per file): walk the varint framing and emit one
    row per cold-state segment. Stage 2 (one task per SEGMENT, after a
    repartition that spreads a single file's segments over the
    cluster): range-read the segment's bytes and decode with a fresh
    decoder, frame_ids offset to stay file-global.
    """

    def scan_files(batches):
        import pyarrow as pa

        from pyjelly_spark.jelly.ioutils import scan_stream_segments

        for batch in batches:
            srcs: List[str] = []
            seg_starts: List[int] = []
            seg_ends: List[int] = []
            frame_offsets: List[int] = []
            for source in batch.column("source_file").to_pylist():
                filesystem, fs_path = _fs_for(source)
                for start, end, first_frame in scan_stream_segments(
                    _fs_read(filesystem, fs_path)
                ):
                    srcs.append(source)
                    seg_starts.append(start)
                    seg_ends.append(end)
                    frame_offsets.append(first_frame)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(srcs, pa.string()),
                    pa.array(seg_starts, pa.int64()),
                    pa.array(seg_ends, pa.int64()),
                    pa.array(frame_offsets, pa.int64()),
                ],
                names=["source_file", "seg_start", "seg_end", "frame_offset"],
            )

    segments = paths_df.mapInArrow(
        scan_files,
        schema=(
            "source_file string, seg_start long, seg_end long, "
            "frame_offset long"
        ),
    )

    def decode_segments(batches):
        for batch in batches:
            rows = zip(
                batch.column("source_file").to_pylist(),
                batch.column("seg_start").to_pylist(),
                batch.column("seg_end").to_pylist(),
                batch.column("frame_offset").to_pylist(),
            )
            for source, start, end, frame_offset in rows:
                filesystem, fs_path = _fs_for(source)
                with filesystem.open_input_file(fs_path) as handle:
                    handle.seek(start)
                    data = handle.read(end - start)
                yield from _decode_bytes_batches(
                    source,
                    data,
                    logical_type_strict,
                    frame_id_offset=frame_offset,
                )

    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "8")),
        spark.sparkContext.defaultParallelism,
    )
    # round-robin, not hash: with a handful of segments, hashing
    # (source_file, seg_start) can collide them into one task and
    # silently serialize the decode (measured: 2 segments, 8 slots,
    # 1.03x); round-robin guarantees the even spread, and assignment
    # is correctness-neutral since every task range-reads its own bytes
    return segments.repartition(n_parts).mapInArrow(
        decode_segments, schema=READ_SCHEMA
    )


def read_jelly_stream(
    spark: SparkSession,
    path: str,
    logical_type_strict: Optional[str] = None,
) -> DataFrame:
    """Structured Streaming source over a directory of .jelly files.

    Files arriving in ``path`` are discovered by the ``binaryFile``
    stream source and each decodes (statelessly — Jelly streams are
    self-contained per file) into the same flat statements schema as
    :func:`read_jelly`. Compose with watermarks/windows downstream;
    drain with ``trigger(availableNow=True)`` for batch parity. This is
    the engine's native analogue of the reference's "streaming" framing:
    frames arrive incrementally, decode state lives inside one file.

    ``logical_type_strict``: None / "flat" / "grouped" — the same
    reference strict gate as :func:`read_jelly`, applied per arriving
    file (a mismatched file fails its micro-batch).
    """
    if logical_type_strict not in (None, "flat", "grouped"):
        raise ValueError(
            "logical_type_strict must be None, 'flat' or 'grouped'"
        )
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length BIGINT, content BINARY"
        )
        .option("pathGlobFilter", "*.jelly")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def decode_files(batches):
        for batch in batches:
            sources = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for source, data in zip(sources, contents):
                yield from _decode_bytes_batches(
                    source, bytes(data), logical_type_strict
                )

    return stream.mapInArrow(decode_files, schema=READ_SCHEMA)


FRAME_META_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), False),
        StructField("frame_id", LongType(), False),
        StructField("n_rows", LongType(), False),
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),
    ]
)


def read_jelly_frame_meta(spark: SparkSession, path: str) -> DataFrame:
    """Per-frame metadata of .jelly file(s), distributed.

    One row per (frame, metadata key); frames without metadata yield one
    row with null key/value so every frame is visible. This surfaces the
    side channel the reference exposes via ContextVar
    (/root/reference/pyjelly/integrations/generic/parse.py:186-190) as a
    first-class DataFrame.
    """
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    paths_df = _paths_df(spark, _jelly_files(path))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for source in batch["source_file"]:
                filesystem, fs_path = _fs_for(source)
                data = _fs_read(filesystem, fs_path)
                rows = []
                for frame_id, frame in enumerate(frames_from_bytes(data)):
                    frame_rows, metadata = split_frame(frame)
                    if metadata:
                        for key in sorted(metadata):
                            rows.append(
                                (
                                    source,
                                    frame_id,
                                    len(frame_rows),
                                    key,
                                    metadata[key].decode("latin1"),
                                )
                            )
                    else:
                        rows.append((source, frame_id, len(frame_rows), None, None))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in FRAME_META_SCHEMA]
                    )

    return paths_df.mapInPandas(walk, schema=FRAME_META_SCHEMA)


NAMESPACE_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), False),
        StructField("label", StringType(), False),
        StructField("iri", StringType(), False),
    ]
)


def read_jelly_namespaces(spark: SparkSession, path: str) -> DataFrame:
    """Namespace declarations of .jelly file(s) as (source_file, label,
    iri), distributed (protocol v2 rows; reference surfaces these as
    Prefix events, generic/parse.py:132-141)."""
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    paths_df = _paths_df(spark, _jelly_files(path))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for source in batch["source_file"]:
                filesystem, fs_path = _fs_for(source)
                data = _fs_read(filesystem, fs_path)
                decoder = StreamDecoder()
                rows = []
                for frame in frames_from_bytes(data):
                    frame_rows, _meta = split_frame(frame)
                    for row in frame_rows:
                        event = decoder.decode_row(row)
                        if event is not None and event[0] == "namespace":
                            rows.append((source, event[1], event[2][1]))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in NAMESPACE_SCHEMA]
                    )

    return paths_df.mapInPandas(walk, schema=NAMESPACE_SCHEMA)


def transcode(
    spark: SparkSession,
    src: str,
    out_dir: str,
    options: Optional[jc.StreamOptions] = None,
    grouped_by_graph: bool = False,
    sort_cols: Optional[List[str]] = None,
    n_partitions: Optional[int] = None,
) -> pd.DataFrame:
    """Distributed format/framing transcoder: .jelly or .nt/.nq input ->
    .jelly output under any options.

    Covers the reference's conversion surface (e.g. QUADS -> GRAPHS via
    ``split_to_graphs``, flat -> grouped re-framing, preset/frame-size
    changes) as one Spark job: read -> (optional graph-keyed repartition
    + in-partition sort) -> write. Returns the write manifest.

    ``grouped_by_graph`` repartitions on the graph value and sorts each
    partition graph-major, so consecutive runs == whole graphs (one frame
    per graph). For flat output the statement order is the reader's
    (source_file, stmt_idx) order within each input file.
    """
    lower = src.lower()
    if lower.endswith((".nt", ".nq")):
        from pyjelly_spark.sources.nt_source import read_nt

        stmts = read_nt(spark, src)
    else:
        stmts = read_jelly(spark, src)
    if grouped_by_graph:
        parts = n_partitions or max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "8")) // 2, 1
        )
        stmts = stmts.repartition(parts, "g_value").sortWithinPartitions(
            *(sort_cols or ["g_value", "s_value", "p_value", "o_value"])
        )
    elif sort_cols:
        stmts = stmts.sortWithinPartitions(*sort_cols)
    return write_jelly(
        stmts,
        out_dir,
        options=options,
        grouped_by_graph=grouped_by_graph,
        resume=False,
    )


def read_manifest_frames(path: str) -> List[dict]:
    """Frame-level stats of one .jelly file (debug/lineage helper)."""
    filesystem, fs_path = _fs_for(path)
    data = _fs_read(filesystem, fs_path)
    decoder = StreamDecoder()
    out = []
    for i, frame in enumerate(frames_from_bytes(data)):
        rows, metadata = split_frame(frame)
        events = [e for e in (decoder.decode_row(r) for r in rows) if e is not None]
        out.append(
            {
                "frame": i,
                "rows": len(rows),
                "statements": len(events),
                "metadata": {k: v.decode("latin1") for k, v in metadata.items()},
            }
        )
    return out


def write_jelly_stream(
    flat_statements: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    options: Optional[jc.StreamOptions] = None,
    grouped_by_graph: bool = False,
    namespaces: Optional[dict] = None,
    available_now: bool = True,
    query_name: str = "jelly_stream_writer",
):
    """Structured Streaming .jelly SINK — the write-side complement of
    :func:`read_jelly_stream`.

    Each micro-batch lands under ``out_dir/batch=<id>/`` as a complete,
    self-contained Jelly stream directory (same layout, manifest and
    options handling as :func:`write_jelly`, so :func:`read_jelly` over
    ``out_dir`` sees the union of all batches). Exactly-once at the
    file level on top of foreachBatch's at-least-once replay contract:

    - a replayed batch id whose ``_SUCCESS`` marker exists is skipped
      entirely (one metadata stat, no job);
    - a batch that failed MID-write resumes through ``write_jelly``'s
      per-partition manifest (completed partitions skip, the rest
      rewrite byte-identically — encoding is deterministic);
    - the ``_SUCCESS`` marker is written only after the whole batch's
      manifest is durable, and readers list only ``*.jelly`` files, so
      a torn batch is never half-visible to :func:`read_jelly_stream`
      (partition files are temp-named until their final rename,
      see ``write_jelly``).

    The reference's streaming story is frame-at-a-time over one socket
    (SURVEY.md §2.8); this is the cluster analogue: micro-batched,
    checkpointed, idempotent, partition-parallel within each batch.
    Returns the started StreamingQuery; callers ``awaitTermination``.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_dir = posixpath.join(out_dir, f"batch={batch_id:08d}")
        filesystem, base = _fs_for(batch_dir)
        marker = posixpath.join(base, "_SUCCESS")
        if _fs_exists(filesystem, marker):
            return  # replayed batch: already durable, skip
        write_jelly(
            batch_df,
            batch_dir,
            options=options,
            resume=True,
            grouped_by_graph=grouped_by_graph,
            namespaces=namespaces,
        )
        with filesystem.open_output_stream(marker) as out:
            out.write(b"")

    writer = (
        flat_statements.writeStream.foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
