"""Entry-point shim preserving the reference CLI surface:
``python main.py --models ... --bootstrap-iterations ... --sample-size ...``
(reference main.py:71-80). The implementation lives in
multimodal_embedding_tpu/cli/main.py.
"""

from multimodal_embedding_tpu.cli.main import main

if __name__ == "__main__":
    raise SystemExit(main())
