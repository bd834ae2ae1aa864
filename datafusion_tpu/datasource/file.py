"""File-backed tables: Parquet / CSV / JSON.

Reference parity: `ListingTable` (`datasource/listing/table.rs:617`) +
format execs (`datasource/physical_plan/{parquet,csv,json}.rs`). Scans
list the files, prune with predicate min/max row-group statistics
(PruningPredicate analog) and read only the projected columns.
"""
from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional, Sequence

from ..common.batch import Batch
from ..common.errors import ExecutionError, PlanError
from ..common.schema import Schema
from ..common.stats import ColumnStatistics, Precision, Statistics
from .arrow_convert import arrow_schema_to_schema, arrow_table_to_batch
from .provider import TableProvider


def _expand(path: str) -> List[str]:
    if os.path.isdir(path):
        out = []
        for ext in ("parquet", "csv", "json"):
            out.extend(sorted(_glob.glob(os.path.join(path, f"*.{ext}"))))
        return out
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return [path]


class ParquetTable(TableProvider):
    def __init__(self, path: str, table_partition_cols=None):
        import pyarrow.parquet as pq
        self.paths = _expand(path)
        if not self.paths:
            raise PlanError(f"no files found at {path}")
        self._pq = pq
        md = pq.read_schema(self.paths[0])
        self._schema = arrow_schema_to_schema(md)
        self._stats_cache = None

    def schema(self) -> Schema:
        return self._schema

    def scan(self, projection, filters, limit, ctx):
        from ..physical.plan.file_scan import ParquetScanExec
        return ParquetScanExec(self, projection, filters, limit)

    def statistics(self) -> Statistics:
        if self._stats_cache is None:
            rows = 0
            nbytes = 0
            for p in self.paths:
                md = self._pq.ParquetFile(p).metadata
                rows += md.num_rows
                for rg in range(md.num_row_groups):
                    nbytes += md.row_group(rg).total_byte_size
            self._stats_cache = Statistics(
                Precision.exact(rows), Precision.inexact(nbytes),
                [ColumnStatistics() for _ in self._schema.fields])
        return self._stats_cache


class CsvTable(TableProvider):
    def __init__(self, path: str, has_header: bool = True,
                 delimiter: str = ",", schema: Optional[Schema] = None):
        self.paths = _expand(path)
        if not self.paths:
            raise PlanError(f"no files found at {path}")
        self.has_header = has_header
        self.delimiter = delimiter
        self._schema = schema or self._infer()

    def _infer(self) -> Schema:
        import pyarrow.csv as pcsv
        ro = pcsv.ReadOptions(autogenerate_column_names=not self.has_header)
        po = pcsv.ParseOptions(delimiter=self.delimiter)
        t = pcsv.read_csv(self.paths[0], read_options=ro, parse_options=po)
        return arrow_schema_to_schema(t.schema)

    def schema(self) -> Schema:
        return self._schema

    def scan(self, projection, filters, limit, ctx):
        from ..physical.plan.file_scan import CsvScanExec
        return CsvScanExec(self, projection, limit)


class JsonTable(TableProvider):
    """Newline-delimited JSON."""

    def __init__(self, path: str, schema: Optional[Schema] = None):
        self.paths = _expand(path)
        if not self.paths:
            raise PlanError(f"no files found at {path}")
        self._schema = schema or self._infer()

    def _infer(self) -> Schema:
        import pyarrow.json as pjson
        t = pjson.read_json(self.paths[0])
        return arrow_schema_to_schema(t.schema)

    def schema(self) -> Schema:
        return self._schema

    def scan(self, projection, filters, limit, ctx):
        from ..physical.plan.file_scan import JsonScanExec
        return JsonScanExec(self, projection, limit)
