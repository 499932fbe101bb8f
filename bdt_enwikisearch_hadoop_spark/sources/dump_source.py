"""A custom PYTHON DATA SOURCE (Spark 4 ``pyspark.sql.datasource``
API): the pluggable-connector surface a real ingestion path uses —
here, a deterministic synthetic "dump" generator standing in for the
reference archetype's enwiki dump splits.

Why this exists: §2.A covers the file formats Spark ships
(parquet/CSV/JSON/ORC/text); the Python DataSource API is how an
engine ingests everything else (an HTTP dump mirror, a proprietary
archive, a scraping frontier) WITHOUT leaving the DataFrame reader
abstraction.  The connector below demonstrates the full contract:

* ``partitions()`` declares the split list driver-side (metadata only
  — like file listings, never data);
* ``read(partition)`` runs ON EXECUTORS, one call per split, yielding
  rows — at 100 TB each split maps to one dump file/byte-range and the
  cluster pulls them in parallel;
* the source composes with everything downstream: filters, the i-suite
  tokenize→index pipeline, sinks — it is just another DataFrame.

Determinism: content is a pure function of (doc_id), so any partition
count yields the same table — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: tiny deterministic vocabulary for synthetic text
_WORDS = (
    "spark join query window scan merge sort key fast stream",
    "table hash group order big small filter customer value data",
)


def _synth_text(doc_id: int) -> str:
    """Deterministic pseudo-document: words picked by arithmetic on
    doc_id only (no RNG state — reproducible on any executor)."""
    a = _WORDS[0].split()
    b = _WORDS[1].split()
    n = 8 + (doc_id * 7) % 9
    return " ".join(
        (a if (doc_id + i) % 3 else b)[(doc_id * 31 + i * 17) % 10]
        for i in range(n)
    )


class DumpSplitReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.nsplits = int(options.get("splits", 4))

    def partitions(self):
        return [InputPartition(i) for i in range(self.nsplits)]

    def read(self, partition):
        # executor-side: generate ONLY this split's slice
        per = -(-self.rows // self.nsplits)  # ceil
        lo = partition.value * per
        hi = min(lo + per, self.rows)
        for doc_id in range(lo, hi):
            yield (doc_id, _synth_text(doc_id), f"split{partition.value}")


class DumpStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector: the offset is the next doc_id,
    each micro-batch serves one fixed page — checkpointed offsets make
    a second run RESUME where the first committed (asserted in tests),
    which is the whole streaming-connector contract (a real source
    tracks dump-mirror byte offsets or an API cursor the same way)."""

    def __init__(self, options):
        self.page = int(options.get("page", 25))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        rows = [
            (i, _synth_text(i), f"page{lo // self.page}")
            for i in range(lo, lo + self.page)
        ]
        return iter(rows), {"next": lo + self.page}

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, _synth_text(i), f"page{start['next'] // self.page}")
            for i in range(start["next"], end["next"])
        )


class DumpDataSource(DataSource):
    """``spark.read.format("enwiki_dump").option("rows", N)`` (batch)
    and ``spark.readStream.format("enwiki_dump")`` (streaming)."""

    @classmethod
    def name(cls):
        return "enwiki_dump"

    def schema(self):
        return "doc_id bigint, text string, split string"

    def reader(self, schema):
        return DumpSplitReader(self.options)

    def simpleStreamReader(self, schema):
        return DumpStreamReader(self.options)

    def writer(self, schema, overwrite):
        return DumpTsvWriter(self.options)


class _TsvCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class DumpTsvWriter(DataSourceWriter):
    """Write side of the connector — the TWO-PHASE COMMIT surface:
    each executor task writes its partition to a uniquely-named part
    file and returns a commit message; the driver's ``commit()`` seals
    the job with a manifest only after every task succeeded (``abort()``
    on any failure leaves no manifest, so readers never see a partial
    job).  This is exactly how every exactly-once batch sink works at
    100 TB — the files are cheap, the manifest is the atom."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.tsv")
        n = 0
        with open(part, "w") as f:
            for row in rows:
                f.write("\t".join(str(v) for v in row) + "\n")
                n += 1
        return _TsvCommit(part, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "parts": sorted(m.path for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(DumpDataSource)
