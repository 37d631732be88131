"""Dataset setup CLI (synthetic generators + manual MVTec install).

Flag-compatible with reference utils/download_data.py:187-218, plus the
new --method synthetic-video.
"""

if __name__ == "__main__":
    from vad_tpu.data.synthetic import main

    main()
