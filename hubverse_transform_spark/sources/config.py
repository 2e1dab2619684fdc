"""Hub-config (tasks.json) loader (Layer A).

Config is control-plane, not data-plane: a KB-sized JSON read once per
pipeline, so this is a driver-side ``json.load`` — deliberately NOT
``spark.read.json`` (ref: _read_tasks, model_output.py:192-209; a missing or
unreadable tasks.json is fatal at pipeline construction, model_output.py:105-106).
"""

from __future__ import annotations

import json
import logging
import posixpath
from typing import Any

logger = logging.getLogger(__name__)

TASKS_RELATIVE_PATH = "hub-config/tasks.json"


def read_tasks(hub_path: str) -> dict[str, Any] | None:
    """Load ``<hub_path>/hub-config/tasks.json``; None on any failure.

    Local paths use plain open(); object-store URIs would go through the
    cluster's Hadoop filesystem in a real deployment — the contract (dict or
    None, caller decides fatality) matches ref model_output.py:192-209.
    """
    uri = posixpath.join(str(hub_path), TASKS_RELATIVE_PATH)
    try:
        with open(uri, encoding="utf-8") as f:
            return json.load(f)
    except Exception as e:  # noqa: BLE001 — any read/parse failure => None
        logger.warning({"message": f"could not read tasks.json: {e}", "path": uri})
        return None
