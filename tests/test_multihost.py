"""Multi-host batch coordination (parallel/multihost.py).

The partition logic is unit-tested in-process; the jax.distributed path
is exercised for real with TWO coordinated CPU processes over a local
TCP coordinator — shard disjointness/completeness and the allgather
aggregation are asserted across the actual DCN collective layer.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

from video_restore_tpu.parallel.multihost import shard_items

REPO = Path(__file__).resolve().parent.parent


def test_shard_items_partition():
    items = [f"v{i}" for i in range(11)]
    shards = [shard_items(items, pid, 3) for pid in range(3)]
    # disjoint + complete + round-robin balanced
    flat = [x for s in shards for x in s]
    assert sorted(flat) == sorted(items)
    assert len(set(flat)) == len(items)
    assert [len(s) for s in shards] == [4, 4, 3]
    # single process: everything
    assert shard_items(items, 0, 1) == items


_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from video_restore_tpu.parallel.multihost import (
    allgather_counts, init_multihost, shard_items,
)

coord, pid = sys.argv[1], int(sys.argv[2])
init_multihost(coord, 2, pid)
items = [f"v{i}" for i in range(5)]
mine = shard_items(items)
rows = allgather_counts([len(mine), 7 + pid])
print("RESULT " + json.dumps({"pid": pid, "mine": mine, "rows": rows}))
"""


def test_two_process_distributed_batch_shard(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=tmp_path, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    by_pid = {o["pid"]: o for o in outs}
    assert by_pid[0]["mine"] == ["v0", "v2", "v4"]
    assert by_pid[1]["mine"] == ["v1", "v3"]
    # both processes saw the same global gathered counts
    expected = [[3, 7], [2, 8]]
    assert by_pid[0]["rows"] == expected
    assert by_pid[1]["rows"] == expected
