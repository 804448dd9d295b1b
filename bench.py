"""Driver entry point — delegates to the packaged benchmark.

The driver contract is `python bench.py` at the repo root printing one
JSON line; the implementation lives in pcseg_tpu.bench so the installed
`pcseg-tpu bench` subcommand works outside a repo checkout. Re-exports
the module namespace (configs, helpers) for the experiments/ scripts
that share them via `import bench`.
"""

from pcseg_tpu.bench import *  # noqa: F401,F403
from pcseg_tpu.bench import main

if __name__ == "__main__":
    main()
