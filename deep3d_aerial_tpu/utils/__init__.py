from .logging import StageTimer, tee_logs

__all__ = ["StageTimer", "tee_logs"]
