"""Per-stage execution breakdown for any driver query — the feedback loop
SURVEY §7 prescribes ("read ds.stats() for the stage and iterate").

Usage: python tools/explain.py <query_name> [sf_dir] [num_cpus]

Runs the query to completion and prints Ray Data's operator-level stats
(wall time, rows, block sizes) so a slow stage is attributable to a
specific operator rather than guessed at.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        import __ray_entry__ as e

        print(__doc__)
        print("queries:", ", ".join(sorted(e.queries())))
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    import __ray_entry__ as e

    res = e.queries()[name](sf_dir)
    import pandas as pd
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        res = res.materialize()  # stats attach to the executed plan
        print(f"# {name}: {res.count()} rows\n")
        print(res.stats())
    else:
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        print(f"# {name}: {len(df)} rows (driver-side result; no Dataset stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
