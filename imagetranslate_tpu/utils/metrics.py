"""Structured step metrics (replaces the reference's bare prints,
train_image_mt.py:302-306), with the same telemetry: loss per token and
tokens/sec, emitted every `log_every` steps, plus optional JSONL dumps."""

from __future__ import annotations

import json
import time
from typing import Optional, TextIO


class StepMeter:
    def __init__(self, log_every: int = 50, jsonl: Optional[TextIO] = None,
                 prefix: str = ""):
        self.log_every = log_every
        self.jsonl = jsonl
        self.prefix = prefix
        self.reset_window()
        self.total_tokens = 0
        self.total_loss = 0.0

    def reset_window(self):
        self.win_tokens = 0
        self.win_loss = 0.0
        self.win_start = time.time()

    def update(self, step: int, sum_loss: float, ntokens: float):
        self.win_tokens += ntokens
        self.win_loss += sum_loss
        self.total_tokens += ntokens
        self.total_loss += sum_loss
        if step % self.log_every == 0 and self.win_tokens > 0:
            elapsed = max(time.time() - self.win_start, 1e-9)
            tps = self.win_tokens / elapsed
            loss = self.win_loss / self.win_tokens
            print(f"{self.prefix}step {step} loss {loss:.4f} "
                  f"tokens/sec {tps:.1f}", flush=True)
            if self.jsonl is not None:
                self.jsonl.write(json.dumps(
                    {"step": step, "loss": loss, "tokens_per_sec": tps}) + "\n")
                self.jsonl.flush()
            self.reset_window()

    def epoch_loss(self) -> float:
        return self.total_loss / max(self.total_tokens, 1)
