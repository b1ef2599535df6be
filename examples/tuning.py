"""Offline hyperparameter search over an NNI-format search space.

Reference analog: ``--mode tune`` + NNI (reference utils/utils.py:197-223).
NNI needs a server; this driver (recstudio_tpu/tune.py) consumes the same
search-space YAMLs offline — random or grid — and writes a CSV leaderboard.

Run:  python examples/tuning.py            # 4 random trials of BPR
  or: python -m recstudio_tpu.tune -m BPR -d ml-100k --strategy grid
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recstudio_tpu.tune import main

main(["-m", "BPR", "-d", "ml-100k", "--strategy", "random", "--trials", "4",
      "--epochs", "8", "--out", "/tmp/bpr-tune.csv"])
print("leaderboard written to /tmp/bpr-tune.csv")
