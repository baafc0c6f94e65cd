#!/usr/bin/env python3
"""Multi-frame TactileSR (MTSR) training entry with trunk transfer.

CLI parity with the reference: ``python train/tactileSRSeqs_train.py`` trains
the seqsCnt=7 model on the SeqsDataset, warm-starting its pattern/force
feature-extraction trunks from the single-frame checkpoint (config key
``load_checkpoint_dir``).  ``-c config.yaml`` / ``--<key> value`` override
any scalar config key; ``--epochs`` shortens the run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tactilesr_tpu

tactilesr_tpu.maybe_force_platform()

from tactilesr_tpu.parallel import init_distributed

# multi-host bootstrap: no-op single-host; TACTILESR_*/SLURM env derive
# the cluster otherwise (parallel/dist.py)
init_distributed()

from tactilesr_tpu.config import ConfigArgumentParser, tactileSeqs_config
from tactilesr_tpu.config.parser import add_config_args, apply_overrides
from tactilesr_tpu.tasks.sr_task import main


if __name__ == "__main__":
    parser = ConfigArgumentParser(description=__doc__)
    add_config_args(parser, tactileSeqs_config)
    args = parser.parse_args()
    config = apply_overrides(tactileSeqs_config, args)
    main(config, seqs=True)
