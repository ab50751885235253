"""tpulmi 40M benchmark — 4x the reference's largest published run, ONE chip.

The reference's biggest result is 10M rows on one EPYC core
(`/root/reference/README.md:16-24`). This drives the bench_20m harness at
FORTY million 768-d rows on one 16 GB TPU chip, which only the packed int4
store makes possible:

- packed int4 store (tpulmi/ops/quantize.py): 40M x 768 x 0.5 B ≈ 15.4 GB
  — int8 (30.7 GB) and bf16 (61.4 GB) cannot fit;
- 16 outer groups x 61 inner buckets = 976 global buckets, preserving the
  ~41k rows/bucket geometry the kernel tiling was measured at (NOTES.md);
- exact host rerank with the int4-depth candidate pool erases the ~4e-3
  quantization error.

Same JSON schema / recall gate as bench_20m.py (baseline = the reference's
10M numbers, the largest it can do at all).
"""
import os
import sys

os.environ.setdefault("B20_N", "40000000")
os.environ.setdefault("B20_GROUPS", "16")
os.environ.setdefault("B20_INNER", "61")
os.environ.setdefault("B20_CLUSTERS", "488")
os.environ.setdefault("B20_DTYPE", "int4")
# qc=96 shrinks the kernel's n_cat*qc per-slot buffer floor: the int4
# store + scales + ids leave ~760 MB of HBM free (measured: the 10k-query
# qc=128 program wanted 898 MB and missed by 138 MB), and at the typical
# 164-246 slots/bucket occupancy qc=96 keeps the same 2-3 query blocks
# per bucket as 128 — the floor drops 25% for little re-read cost
os.environ.setdefault("B20_QC", "96")
# start the query-batch ladder where the programs fit (see B20_BQ note)
os.environ.setdefault("B20_BQ", "2500")
# 976 buckets: 12 probes measured recall 0.8458 (first 40M session) —
# below the 0.90 gate, so the sweep starts at 16. The sweep STOPS at 24:
# 32 probes RESOURCE_EXHAUSTed at bq=2500 AND bq=1000 (second session),
# and on this backend a failed dispatch leaks its staged operands, killing
# every later dispatch in the process. Depth, not probes, is the recall
# lever past 24 (containment@24 is 0.9707 while recall plateaus ~0.89 at
# rerank_extra=30): bench_20m's RR_UP escalation ladder deepens the exact
# rerank instead.
os.environ.setdefault("B20_SWEEP", "16,20,24")

import bench_20m  # noqa: E402  (env is read inside main(), not at import)

if __name__ == "__main__":
    try:
        code = bench_20m.main()
    except BaseException:  # noqa: BLE001 — remote teardown hangs after errors
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        os._exit(1)
    os._exit(code)
