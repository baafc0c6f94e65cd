"""`python -m tactilesr_tpu` — command index for the framework's CLIs.

The reference exposes only bare training scripts (train/*.py); this package
adds several operational CLIs, so the bare module invocation prints the map
rather than guessing a default.
"""

import sys

COMMANDS = [
    ("train/tPSFNet_train.py", "stage 1: fit the PSF physics model"),
    ("train/tactileSR_train.py", "stage 3: single-frame SR (STSR)"),
    ("train/tactileSRSeqs_train.py", "stage 4: multi-frame SR (MTSR) with trunk transfer"),
    ("-m tactilesr_tpu.data.generate", "synthetic raw blobs / SRdataset / SeqsDataset generation"),
    ("-m tactilesr_tpu.serving", "batched SR inference from a checkpoint (+ --evaluate)"),
    ("-m tactilesr_tpu.server", "micro-batched HTTP serving endpoint"),
    ("-m tactilesr_tpu.compat.torch_convert", "reference .pth -> .ckpt"),
    ("-m tactilesr_tpu.compat.export_torch", ".ckpt -> reference-loadable .pth"),
]


def main() -> int:
    print("tactilesr_tpu — TPU-native tactile super-resolution framework\n")
    print("usage: python <command> --help\n")
    width = max(len(c) for c, _ in COMMANDS) + 7  # len("python ")
    for cmd, desc in COMMANDS:
        print(f"  {'python ' + cmd:<{width}}  {desc}")
    print("\ndocs: README.md, docs/DESIGN.md, docs/PERF.md, PARITY.md, RESULTS.md")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `python -m tactilesr_tpu | head -1`
        sys.exit(0)
