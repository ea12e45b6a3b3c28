"""Launcher shim: `python main.py ...` == reference CLI surface
(reference main.py). See dnn_compression_tensor_admm_tpu/cli/main.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dnn_compression_tensor_admm_tpu.cli.main import main

if __name__ == "__main__":
    main()
