from .post_process import PROCESS_TOOLBOX

__all__ = ["PROCESS_TOOLBOX"]
