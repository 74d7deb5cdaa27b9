"""RLBench / real-robot workspace constants and semantic mask label ids.

Values mirror the reference (genrobo3d/configs/rlbench/constants.py:2-79) —
these are facts about the simulator scenes, not code.
"""


def get_robot_workspace(real_robot=False, use_vlm=False):
    if real_robot:
        if use_vlm:
            return {"TABLE_HEIGHT": 0.0, "X_BBOX": (-0.60, 0.2),
                    "Y_BBOX": (-0.54, 0.54), "Z_BBOX": (-0.02, 0.75)}
        return {"TABLE_HEIGHT": 0.01, "X_BBOX": (-0.60, 0.2),
                "Y_BBOX": (-0.54, 0.54), "Z_BBOX": (0, 0.75)}
    return {"TABLE_HEIGHT": 0.7505, "X_BBOX": (-0.5, 1.5),
            "Y_BBOX": (-1, 1), "Z_BBOX": (0.2, 2)}


_TABLE_EXTRA = {
    "close_jar_peract": [86], "close_jar": [86], "light_bulb_in_peract": [98],
    "change_channel": [102], "empty_container": [86], "light_bulb_in": [97],
    "light_bulb_out": [95], "open_jar": [89], "tv_on": [102],
    "close_fridge": [81],
}


def get_rlbench_labels(task, table=True, robot=True, wall=True, floor=True):
    labels = []
    if table:
        labels += [48, 51, 52]
        labels += _TABLE_EXTRA.get(task, [])
    if floor:
        labels += [8, 9, 10, 70, 71]
    if robot:
        labels += list(range(12, 48)) + [67, 68, 69]
    if wall:
        labels += [53, 54, 55, 56, 57]
    labels += [65535]  # undefined
    return labels
