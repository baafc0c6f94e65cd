"""Real 2-process coverage of parallel/dist.py's multi-process branches
(VERDICT r1 item 2): two subprocesses join a jax.distributed cluster on the
CPU backend and assert reduce_dict / all_gather_object / gather_object /
proc-0 gating behave; bootstrap runs through the TACTILESR_* env derivation."""

import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dist_branches(tmp_path):
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # scrub the 8-device fake mesh: keep each worker at 1 CPU device
        if k not in ("XLA_FLAGS",)
    }
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env.update(
            TACTILESR_COORDINATOR=f"127.0.0.1:{port}",
            TACTILESR_NUM_PROCESSES="2",
            TACTILESR_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in: {out}"
        res = json.loads(line[-1][len("RESULT "):])
        results[res["rank"]] = res

    assert set(results) == {0, 1}
    for rank, res in results.items():
        assert res["world"] == 2
        assert res["main"] == (rank == 0)
        # mean of loss {1,2} = 1.5; acc {10,20} = 15
        assert res["reduced_avg"] == {"loss": 1.5, "acc": 15.0}
        assert res["reduced_sum"] == {"loss": 3.0}
        # both processes see both (differently-sized, arbitrary-picklable) objects
        assert res["gathered"] == [
            {"rank": 0, "tag": "p0", "nested": [0, {"x": 0}]},
            {"rank": 1, "tag": "pp1", "nested": [1, {"x": 1}]},
        ]
    # rooted gather: list on process 0, None elsewhere
    assert results[0]["rooted"] == [{"r": 0}, {"r": 1}]
    assert results[1]["rooted"] is None
