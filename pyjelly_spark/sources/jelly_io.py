"""Spark <-> Jelly boundary: distributed .jelly writer and reader.

Write side: one Spark partition == one independent Jelly stream (its own
options row + lookup tables), mirroring one pyjelly ``Stream`` instance
per output (/root/reference/pyjelly/serialize/streams.py:48-67). The
encoder is inherently sequential per stream, so it lives inside a single
``mapInPandas`` pass — the sanctioned escape hatch — while everything
upstream stays declarative. Frames are written incrementally (constant
memory per partition, like the reference's bounded flows).

Each partition also emits a manifest row (statement/frame/byte counts,
stream sha256, repo range) — the per-partition lineage that makes the
job checkpoint-resumable: a rerun skips partitions whose manifest entry
exists and whose file sha still matches.

Read side: a listing of .jelly files fans out over executors; each file
decodes independently (streams are self-contained by construction).
"""

from __future__ import annotations

import hashlib
import json
import os
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
from pyjelly_spark.jelly.ioutils import frames_from_bytes

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
    """Vector-ish tuple construction for one slot of one Arrow batch."""
    out = []
    append = out.append
    for kind, value, lang, datatype in zip(kinds, values, langs, datatypes):
        if kind == "iri":
            append(("iri", value))
        elif kind == "lit":
            append(("lit", value, lang or "", datatype or ""))
        elif kind == "bnode":
            append(("bnode", value))
        else:
            append(("dg",))
    return out


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict:
    """partition_id -> manifest dict for all completed partitions."""
    directory = manifest_path(out_dir)
    entries = {}
    if os.path.isdir(directory):
        for name in os.listdir(directory):
            if name.endswith(".json"):
                with open(os.path.join(directory, name)) as handle:
                    entry = json.load(handle)
                entries[entry["partition_id"]] = entry
    return entries


def _completed_partition_ids(out_dir: str) -> set:
    """Partitions safely resumable: manifest present and file sha matches."""
    done = set()
    for pid, entry in load_manifest(out_dir).items():
        path = entry["file"]
        if not os.path.exists(path):
            continue
        digest = hashlib.sha256()
        with open(path, "rb") as handle:
            for chunk in iter(lambda: handle.read(1 << 20), b""):
                digest.update(chunk)
        if digest.hexdigest() == entry["stream_sha256"]:
            done.add(pid)
    return done


def write_jelly(
    flat_triples: DataFrame,
    out_dir: str,
    options: Optional[jc.StreamOptions] = None,
    resume: bool = True,
) -> pd.DataFrame:
    """Write pre-partitioned, pre-sorted flat triples as .jelly part files.

    ``flat_triples`` must already carry s_/p_/o_ flattened term columns in
    final statement order per partition (the caller owns partitioning —
    see pipeline.plan_partitions). Returns the manifest as pandas.

    This is an action: it runs the job and persists manifest entries.
    """
    from pyjelly_spark.session import ship_package

    ship_package(flat_triples.sparkSession)
    if options is None:
        options = jc.StreamOptions()
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(manifest_path(out_dir), exist_ok=True)
    skip_ids = _completed_partition_ids(out_dir) if resume else set()
    opts_dict = {
        "physical_type": options.physical_type,
        "logical_type": options.logical_type,
        "names": options.preset.names,
        "prefixes": options.preset.prefixes,
        "datatypes": options.preset.datatypes,
        "frame_rows": options.frame_rows,
        "stream_name": options.stream_name,
    }

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid in skip_ids:
            for _ in batches:
                pass
            return
        stream_options = jc.StreamOptions(
            physical_type=opts_dict["physical_type"],
            logical_type=opts_dict["logical_type"],
            preset=jc.TablePreset(
                opts_dict["names"], opts_dict["prefixes"], opts_dict["datatypes"]
            ),
            frame_rows=opts_dict["frame_rows"],
            stream_name=opts_dict["stream_name"],
        )
        encoder = StreamEncoder(stream_options)
        quads = stream_options.physical_type == jc.PHYSICAL_QUADS
        path = os.path.join(out_dir, f"part-{pid:05d}.jelly")
        tmp_path = path + ".inprogress"
        digest = hashlib.sha256()
        n_statements = n_frames = n_bytes = 0
        repo_min = repo_max = None
        add_triple = encoder.add_triple
        add_quad = encoder.add_quad
        with open(tmp_path, "wb") as sink:

            def emit(frame: bytes) -> None:
                nonlocal n_frames, n_bytes
                chunk = delimit(frame)
                sink.write(chunk)
                digest.update(chunk)
                n_frames += 1
                n_bytes += len(chunk)

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
                if quads:
                    graphs = _terms_from_arrays(
                        batch["g_kind"].values,
                        batch["g_value"].values,
                        batch["g_lang"].values,
                        batch["g_datatype"].values,
                    )
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
            if n_statements:
                tail = encoder.take_frame(
                    metadata={"partition": str(pid).encode("ascii")}
                )
                if tail is not None:
                    emit(tail)
        if n_statements == 0:
            os.remove(tmp_path)
            return
        os.replace(tmp_path, path)
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
        with open(os.path.join(manifest_path(out_dir), f"part-{pid:05d}.json"), "w") as m:
            json.dump(entry, m)
        yield pd.DataFrame([entry])

    manifest_df = flat_triples.mapInPandas(write_partition, schema=MANIFEST_SCHEMA)
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


def _term_cols(term: Optional[tuple]) -> Tuple[Optional[str], ...]:
    if term is None:
        return (None, None, None, None)
    kind = term[0]
    if kind == "lit":
        return ("lit", term[1], term[2], term[3])
    if kind == "dg":
        return ("dg", None, None, None)
    return (kind, term[1], None, None)


def read_jelly(spark: SparkSession, path: str) -> DataFrame:
    """Read .jelly file(s) into a flat statements DataFrame.

    Parallelism = one task per file; each Jelly stream is self-contained
    so files decode independently across executors.
    """
    from pyjelly_spark.session import ship_package

    ship_package(spark)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, name)
            for name in os.listdir(path)
            if name.endswith(".jelly")
        )
    else:
        files = [path]
    paths_df = spark.createDataFrame([(f,) for f in files], "source_file: string")
    paths_df = paths_df.repartition(max(len(files), 1))

    def decode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyjelly_spark.jelly.decoder import decode_flat

        for batch in batches:
            for source in batch["source_file"]:
                with open(source, "rb") as handle:
                    data = handle.read()
                rows = []
                for idx, event in enumerate(decode_flat(frames_from_bytes(data))):
                    if event[0] == "triple":
                        graph: Optional[tuple] = None
                        s, p, o = event[1], event[2], event[3]
                    elif event[0] == "quad":
                        s, p, o, graph = event[1], event[2], event[3], event[4]
                    else:
                        continue
                    rows.append(
                        (source, idx)
                        + _term_cols(s)
                        + _term_cols(p)
                        + _term_cols(o)
                        + _term_cols(graph)
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=[f.name for f in READ_SCHEMA])

    return paths_df.mapInPandas(decode_files, schema=READ_SCHEMA)


def read_manifest_frames(path: str) -> List[dict]:
    """Frame-level stats of one .jelly file (debug/lineage helper)."""
    with open(path, "rb") as handle:
        data = handle.read()
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
