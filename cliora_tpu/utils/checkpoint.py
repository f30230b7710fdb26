"""Tiny experiment-state json (reference: cliora/utils/checkpoint.py)."""

import json


def save_experiment(path: str, step: int):
    with open(path, "w") as f:
        json.dump({"step": step}, f)


def load_experiment(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
