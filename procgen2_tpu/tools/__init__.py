"""Developer tools: interactive viewer, reference-interop loader,
difference harness, benchmark CLI (counterparts of the reference's
interactive_viewer.py / difference_viewer.py / game_test.py)."""
