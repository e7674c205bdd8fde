"""Quick oracle-parity replay for a named subset of registry queries
(the per-round iteration loop; the full gate is tests/test_oracle_parity).

Usage: python scripts/check_new_parity.py name1 name2 ...
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from emails_to_vector_db_spark.plans import REGISTRY  # noqa: E402
from emails_to_vector_db_spark.session import (  # noqa: E402
    get_spark,
    use_tmpfs_scratch,
)

# measurement entrypoint: tmpfs shuffle scratch (r11 stall fix),
# $SPARK_GRAFT_LOCAL_DIR wins when set
use_tmpfs_scratch()
from tests.conftest import SF_ORACLE, duck_con, rows_match  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="parity-check", cpus=8, shuffle_partitions=8)
    con = duck_con(SF_ORACLE)
    failed = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, SF_ORACLE)
            duck = con.execute(spec.oracle)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
            assert sorted(duck_cols) == sorted(sdf.columns), (
                f"columns differ: duck={sorted(duck_cols)} "
                f"spark={sorted(sdf.columns)}"
            )
            dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            remapped = [tuple(r[i] for i in dorder) for r in duck_rows]
            sdf2 = sdf.select(*sorted(sdf.columns))
            ok, msg = rows_match(sdf2, remapped)
            assert ok, msg
            print(f"PASS {name} ({len(duck_rows)} rows, "
                  f"{time.perf_counter() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {exc}")
        finally:
            spark.catalog.clearCache()
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
