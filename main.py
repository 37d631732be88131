"""Web UI launcher (reference main.py:835-847 equivalent).

Serves the six-tab gradio app on 0.0.0.0:7860.  gradio is an optional
dependency; without it this prints install instructions instead of a
traceback (the CLI scripts cover every UI capability headlessly).
"""

import sys

if __name__ == "__main__":
    print("=" * 60)
    print("ANOMALY DETECTION SYSTEM (TPU-native)")
    print("=" * 60)
    try:
        import gradio  # noqa: F401
    except ImportError:
        print(
            "\nThe web UI requires gradio, which is not installed in this "
            "environment.\nInstall it with `pip install gradio`, or use the "
            "CLI equivalents:\n"
            "  python train.py --category <cat>           # train image model\n"
            "  python train_video.py --category <cat>     # train video model\n"
            "  python evaluate.py --checkpoint <ckpt>     # image AUROC + plots\n"
            "  python evaluate_video.py --checkpoint <c>  # video AUROC / annotated mp4\n"
            "  python download_data.py --method synthetic # create sample data"
        )
        sys.exit(1)

    print("\nStarting application...")
    print("Open: http://localhost:7860")
    print("Press Ctrl+C to stop")
    print("=" * 60)
    from vad_tpu.ui.app import launch

    launch()
