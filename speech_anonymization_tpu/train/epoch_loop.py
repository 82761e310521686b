"""Epoch counter (checkpointable iterator).

Reference: speechbrain.utils.epoch_loop.EpochCounter (convae.yaml:266-267),
a checkpoint recoverable so resumed runs continue at the right epoch.
"""

from __future__ import annotations


class EpochCounter:
    def __init__(self, limit: int):
        self.limit = int(limit)
        self.current = 0

    def __iter__(self):
        while self.current < self.limit:
            self.current += 1
            yield self.current

    def state_dict(self):
        return {"current": self.current, "limit": self.limit}

    def load_state_dict(self, d):
        self.current = int(d["current"])
