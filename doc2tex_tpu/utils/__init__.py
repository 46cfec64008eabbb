from .common import Averager, cal_elapsed_time, update_summary, setup_logger

__all__ = ["Averager", "cal_elapsed_time", "update_summary", "setup_logger"]
