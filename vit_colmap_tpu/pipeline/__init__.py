from vit_colmap_tpu.pipeline.run_pipeline import Pipeline, main

__all__ = ["Pipeline", "main"]
