"""Training-log loss scraping — parity with `Next-DiT-ImageNet/init_loss.py:7-52`.

The reference regex-scrapes `"(step=N) Train Loss: X"` lines out of log.txt
to compare loss curves between runs (its de-facto regression harness,
SURVEY.md §4). Our trainer emits the same format, plus a structured
metrics.jsonl; this module reads both.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Tuple

_LINE_RE = re.compile(r"\(step=(\d+)\) Train Loss: ([0-9.eE+-]+)")


def scrape_log(path: str) -> Tuple[List[int], List[float]]:
    """Parse (steps, losses) from a trainer log.txt (`init_loss.py:7-52`)."""
    steps, losses = [], []
    with open(path) as f:
        for line in f:
            m = _LINE_RE.search(line)
            if m:
                steps.append(int(m.group(1)))
                losses.append(float(m.group(2)))
    return steps, losses


def read_metrics_jsonl(path: str, key: str = "train/loss") -> Tuple[List[int], List[float]]:
    steps, vals = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                steps.append(rec["step"])
                vals.append(rec[key])
    return steps, vals


def compare_runs(run_dirs: Dict[str, str], key: str = "train/loss") -> Dict[str, Tuple]:
    """name -> (steps, losses) across experiment dirs, preferring jsonl."""
    out = {}
    for name, d in run_dirs.items():
        jsonl = os.path.join(d, "metrics.jsonl")
        log = os.path.join(d, "log.txt")
        if os.path.exists(jsonl):
            out[name] = read_metrics_jsonl(jsonl, key)
        elif os.path.exists(log):
            out[name] = scrape_log(log)
    return out
