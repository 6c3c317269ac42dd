"""Custom Python Data Source (PySpark 4 DataSource API) — the modern
analog of Hadoop's "write your own InputFormat" extension point.

A Hadoop InputFormat supplies two things: ``getSplits`` (how the
input divides into independently-readable pieces) and a
``RecordReader`` (how one split becomes records). The Python Data
Source API has the same two hooks — ``DataSourceReader.partitions()``
and ``read(partition)`` — and this module implements them for a
parquet-backed documents source, planning row-range splits from
parquet metadata ONLY (no data read at planning time) and streaming
each split as Arrow record batches (zero row-by-row Python cost).

Scale notes: planning touches only the file footer; each partition
reads its own row slice, so parallelism is the partition count; at
100 TB the same class lists files and plans one partition per
row-group/file instead of fixed row ranges (same two methods).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Columns the source exposes; pruned at read time via pyarrow.
_COLUMNS = ["doc_id", "lang", "n_chars"]


class RowRangePartition(InputPartition):
    """One split: a [start, end) row range of the parquet file."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DocumentsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.num_partitions = int(options.get("numPartitions", "4"))
        if not self.path:
            raise ValueError("docsrc requires option 'path'")

    def partitions(self):
        """getSplits analog: plan row ranges from parquet METADATA —
        the data itself is not read on the driver."""
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_rows
        k = self.num_partitions
        step = (n + k - 1) // k
        return [
            RowRangePartition(i * step, min((i + 1) * step, n))
            for i in range(k)
            if i * step < n
        ]

    def read(self, partition: RowRangePartition):
        """RecordReader analog: one split → Arrow record batches
        (yielding batches, not tuples, keeps the transfer columnar).

        Reads ONLY the row groups overlapping this split's row range
        and trims the boundary rows — k splits collectively read the
        file once, not k times; a split never pays for another
        split's bytes."""
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        md = f.metadata
        rg_start = 0
        for rg in range(md.num_row_groups):
            rg_rows = md.row_group(rg).num_rows
            rg_end = rg_start + rg_rows
            if rg_end > partition.start and rg_start < partition.end:
                t = f.read_row_group(rg, columns=_COLUMNS)
                lo = max(partition.start - rg_start, 0)
                hi = min(partition.end - rg_start, rg_rows)
                yield from t.slice(lo, hi - lo).to_batches()
            rg_start = rg_end


class DocumentsDataSource(DataSource):
    """spark.read.format("docsrc").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "docsrc"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:
        return DocumentsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(DocumentsDataSource)
