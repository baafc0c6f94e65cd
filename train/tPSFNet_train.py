#!/usr/bin/env python3
"""tPSFNet training entry (stage 1: PSF physics estimation).

CLI parity with the reference: ``python train/tPSFNet_train.py`` runs the
full recipe from config/default.py's ``tPSFNet_config`` over the raw
rotateDataset directory.  ``-c config.yaml`` / ``--<key> value`` override
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

from tactilesr_tpu.config import ConfigArgumentParser, tPSFNet_config
from tactilesr_tpu.config.parser import add_config_args, apply_overrides
from tactilesr_tpu.tasks.tpsf_task import main


if __name__ == "__main__":
    parser = ConfigArgumentParser(description=__doc__)
    add_config_args(parser, tPSFNet_config)
    args = parser.parse_args()
    config = apply_overrides(tPSFNet_config, args)
    main(config)
