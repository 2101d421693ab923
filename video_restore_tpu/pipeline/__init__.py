from video_restore_tpu.pipeline.runner import VideoRestorer

__all__ = ["VideoRestorer"]
