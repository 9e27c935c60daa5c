from vit_colmap_tpu.pipeline.run_pipeline import main

if __name__ == "__main__":
    main()
