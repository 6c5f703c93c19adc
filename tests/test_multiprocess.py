"""Two-process distributed L0 execution (VERDICT r4 #6).

Runs `exps/multiprocess_dryrun.py`: two REAL processes bootstrap through
`jax.distributed.initialize` (the `parallel/mesh.distributed_init` env
contract), assemble a cross-process global batch, run a TP x FSDP train
step on the 8-device global mesh, checkpoint collectively, restore, and
step again. The launcher itself asserts rank-identical losses and
bit-exact restored shards; this wrapper pins it into `make test-all`.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_dryrun():
    sys.path.insert(0, REPO)
    from exps.multiprocess_dryrun import launch

    records = launch(timeout_s=900.0)
    assert sorted(records) == [0, 1]
    assert records[0]["loss1"] == records[1]["loss1"]
    assert records[0]["loss2"] == records[1]["loss2"]
