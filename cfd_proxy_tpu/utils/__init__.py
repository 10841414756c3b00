"""L0 substrate: error checking + timing/statistics.

Reference equivalents: `error_handling.h` (SUCCESS_OR_DIE/ASSERT macros) and
`util.c/h` (wall-clock timer, per-iteration min/median/max stats) — see
SURVEY.md §2 L0 and §5.1.
"""

from cfd_proxy_tpu.utils.errors import CheckError, check, check_index_array
from cfd_proxy_tpu.utils.timing import IterationStats, Timer, format_stats_table


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return ((x + m - 1) // m) * m


__all__ = [
    "CheckError",
    "check",
    "check_index_array",
    "Timer",
    "IterationStats",
    "format_stats_table",
    "round_up",
]
