"""Timestamped log lines, format-compatible with the reference
(reference: timelog.py:3-10): ``"%c | HH:MM:SS-elapsed | message"``.
"""

from __future__ import annotations

from time import strftime, time


def timelog(message: str, start_time: float) -> str:
    curr_time = time()
    diff_time = curr_time - start_time
    hrs, rem = divmod(diff_time, 3600)
    mins, secs = divmod(rem, 60)
    curr_time_str = strftime("%c")
    diff_time_str = "{:02}:{:02}:{:02}".format(int(hrs), int(mins), int(secs))
    return f"{curr_time_str} | {diff_time_str} | {message}"
