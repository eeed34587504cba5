#!/usr/bin/env python3
"""Deterministic fixture: parquet with unsigned + float16 columns.

The reference engine ingests UInt8..UInt64 and Float16 parquet columns
natively (reference compute_value.rs:350-431, README.md:46-50). Spark
has no unsigned types, so graft widens on read (SURVEY.md section 1):
u8 -> short, u16 -> int, u32 -> long, u64 -> decimal(20,0),
f16 -> float. This script writes the committed fixture
src/test/resources/unsigned.parquet that q_unsigned_scan /
q_unsigned_agg gate against; values straddle every signed boundary so
a sign-extension bug cannot pass.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import numpy as np

N = 1000
ids = np.arange(N, dtype=np.int64)
# Straddle the signed boundaries: max-of-type values appear throughout.
u8 = ((ids * 37) % 256).astype(np.uint8)           # includes >127
u16 = ((ids * 4099) % 65536).astype(np.uint16)     # includes >32767
u32 = ((ids * 4294967) % 4294967296).astype(np.uint32)  # includes >2^31
# > 2^63 (decimal(20,0) territory); arithmetic kept in uint64.
u64 = np.uint64(2**64 - 1) - ids.astype(np.uint64) * np.uint64(12345678901)
# Float16: exact halves, representable exactly in f16/f32/f64 alike,
# so widened comparisons are bit-stable across engines.
f16 = ((ids % 64) / 2.0 - 8.0).astype(np.float16)

table = pa.table({
    "id": pa.array(ids, pa.int64()),
    "u8": pa.array(u8, pa.uint8()),
    "u16": pa.array(u16, pa.uint16()),
    "u32": pa.array(u32, pa.uint32()),
    "u64": pa.array(u64, pa.uint64()),
    "f16": pa.array(f16, pa.float16()),
})
pq.write_table(table, "src/test/resources/unsigned.parquet",
               compression="snappy")
print(pq.read_schema("src/test/resources/unsigned.parquet"))
