from fava_tpu.pipeline.pipeline import (
    PIPELINE_CHECKPOINT_NAME,
    PIPELINE_SETTINGS_NAME,
    Pipeline,
    main,
)

__all__ = ["Pipeline", "main", "PIPELINE_CHECKPOINT_NAME", "PIPELINE_SETTINGS_NAME"]
