"""Multi-PROCESS sharding dry run (VERDICT r4 item 6): the
process-spanning mesh path a real TPU pod uses (jax.distributed +
cross-process collectives), exercised here with 2 OS processes x 2 CPU
devices over Gloo. The single-process virtual-device dryrun cannot see
host-boundary bugs (non-addressable shards, closure-constant replication,
cross-process collective programs); this one does."""

import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_dryrun_multiprocess_two_procs():
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; "
         "g.dryrun_multiprocess(2, 2, port=12399)"],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT))
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "dryrun_multiprocess(2 procs x 2 devices): ok" in out.stdout
    # every worker's every check passed
    assert out.stdout.count("-> ok") >= 4, out.stdout
