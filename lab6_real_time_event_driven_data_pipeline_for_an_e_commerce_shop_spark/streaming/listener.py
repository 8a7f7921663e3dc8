"""Failure routing / notifications (SURVEY.md §2.6 ST7).

The reference wires Catch → SNS publish → Fail states in Step Functions
(reference stepfunction.json:70-78, 145-153, 156-199). The Spark-native
equivalent is a ``StreamingQueryListener``: ``onQueryTerminated`` fires
for both clean stops and failures, carrying the exception text.

``RecordingListener`` appends one JSON line per lifecycle event to a
local log file (the pluggable "SNS topic" seam — swap ``_notify`` for a
real alert sink in production). Kept driver-side and tiny: listener
callbacks run on the driver's listener bus and must never block.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.streaming import StreamingQueryListener


class RecordingListener(StreamingQueryListener):
    def __init__(self, log_path: str):
        self.log_path = log_path
        os.makedirs(os.path.dirname(log_path), exist_ok=True)

    # -- the "SNS publish" seam ------------------------------------------
    def _notify(self, event: dict) -> None:
        with open(self.log_path, "a") as f:
            f.write(json.dumps(event) + "\n")

    # -- lifecycle callbacks ---------------------------------------------
    def onQueryStarted(self, event) -> None:
        self._notify({"ts": time.time(), "event": "started", "id": str(event.id),
                      "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._notify({"ts": time.time(), "event": "progress", "id": str(p.id),
                      "numInputRows": p.numInputRows})

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._notify(
            {
                "ts": time.time(),
                "event": "failed" if event.exception else "succeeded",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    # -- queries over the notification log -------------------------------
    def events(self) -> list[dict]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def failures(self) -> list[dict]:
        return [e for e in self.events() if e["event"] == "failed"]
