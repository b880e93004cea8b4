"""Entry script for tools/submit.sh — runs the crawl bench via the package
shipped through --py-files (the north_rule's spark-submit deployment path).

The engine code is imported from the zip on the executors' PYTHONPATH, not
from the working directory — proving the packaged artifact is self-contained.
"""

import sys

from etherscan_contract_crawler_spark import bench_crawl

#: defaults applied ONLY when the flag is absent — argparse is last-wins, so
#: blanket-appending them would silently override user-passed flags
_DEFAULTS = {
    "--epochs": "1",
    "--batch-size": "20000",
    "--fetcher": "synthetic",
}

if __name__ == "__main__":
    sys.argv = ["bench_crawl", *sys.argv[1:]]
    for flag, value in _DEFAULTS.items():
        if flag not in sys.argv:
            sys.argv += [flag, value]
    bench_crawl.main()
