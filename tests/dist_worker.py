"""Subprocess body for the 2-process distributed test.

Each worker joins a real ``jax.distributed`` cluster over TCP (CPU backend,
gloo collectives), exercises every multi-process branch of
``tactilesr_tpu.parallel.dist``, and prints one JSON result line the parent
test asserts on.  Bootstrap goes through the TACTILESR_* env derivation in
``init_distributed`` -- the product path, not a hand-rolled initialize.
"""

import json
import os
import sys

import jax

# the launch environment may pin another platform via sitecustomize; the env
# var alone is not honored once that happened, so force via the config API
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tactilesr_tpu.parallel import (  # noqa: E402
    all_gather_object,
    gather_object,
    get_rank,
    get_world_size,
    init_distributed,
    is_main_process,
    reduce_dict,
)


def main() -> None:
    rank = init_distributed()  # derives from TACTILESR_* env vars
    assert rank == int(os.environ["TACTILESR_PROCESS_ID"])
    assert get_rank() == rank
    assert get_world_size() == int(os.environ["TACTILESR_NUM_PROCESSES"])
    assert is_main_process() == (rank == 0)

    reduced_avg = reduce_dict({"loss": float(rank + 1), "acc": 10.0 * (rank + 1)})
    reduced_sum = reduce_dict({"loss": float(rank + 1)}, average=False)

    # arbitrary picklables: nested dict with strings and differently-sized
    # payloads per process (exercises the length-prefixed padding)
    obj = {"rank": rank, "tag": "p" * (rank + 1) + str(rank), "nested": [rank, {"x": rank}]}
    gathered = all_gather_object(obj)

    rooted = gather_object({"r": rank}, dst=0)

    print(
        "RESULT "
        + json.dumps(
            {
                "rank": rank,
                "world": get_world_size(),
                "main": is_main_process(),
                "reduced_avg": reduced_avg,
                "reduced_sum": reduced_sum,
                "gathered": gathered,
                "rooted": rooted,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
