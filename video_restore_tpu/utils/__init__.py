from video_restore_tpu.utils.logging import get_logger, setup_logging

__all__ = ["get_logger", "setup_logging"]
