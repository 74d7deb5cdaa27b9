"""Shared eval utilities: plan-code parsing and locked result appends.

Parity: evaluation/common.py:9-71. Output schema of parse_code matches the
reference exactly — {action, object, target, is_object_variable,
is_target_variable, not_objects, ret_val} with underscores in the action name
replaced by spaces and 'up'/'out'/'down' literal targets folded into the
action name.
"""
from __future__ import annotations

import json
import re
from typing import Dict, Optional

from filelock import FileLock


def write_to_file(filepath, data: Dict):
    lock = FileLock(filepath + ".lock")
    with lock:
        with open(filepath, "a") as f:
            f.write(json.dumps(data) + "\n")
            f.flush()


_PATTERN = re.compile(
    r'^((?P<ret_val>\w+) = ){0,1}(?P<action>\w+)\('
    r'(object=(?P<object>[\w\s"\']+)){0,1}(,\s){0,1}'
    r'(target=(?P<target>[\w\s"\']+)){0,1}(,\s){0,1}'
    r'(not=\[(?P<not_objects>[\w\s"\',]+)\]){0,1}\)'
)


def parse_code(code: str) -> Optional[Dict]:
    res = _PATTERN.search(code)
    if res is None or res["action"] is None:
        return None

    action_name = res["action"].replace("_", " ")

    not_objects = None
    if res["not_objects"] is not None:
        # entries are always variables in the prompt grammar; strip
        # whitespace only, like the reference (common.py:44)
        not_objects = [x.strip() for x in res["not_objects"].split(",")]

    object_name, is_object_variable = None, False
    if res["object"] is not None:
        o = res["object"]
        if o[0] == o[-1] and o[0] in ("\"", "'"):
            object_name = o[1:-1]
        else:
            object_name, is_object_variable = o, True

    target_name, is_target_variable = None, False
    if res["target"] is not None:
        t = res["target"]
        if t[0] == t[-1] and t[0] in ("\"", "'"):
            target_name = t[1:-1]
        else:
            target_name, is_target_variable = t, True
        if target_name in ("up", "out", "down"):
            action_name = f"{action_name} {target_name}"
            target_name = None

    return dict(
        action=action_name, object=object_name, target=target_name,
        is_target_variable=is_target_variable,
        is_object_variable=is_object_variable,
        not_objects=not_objects, ret_val=res["ret_val"],
    )
