#!/usr/bin/env python3
"""Dataset extraction CLI: .mat corpus -> WAV files.

Mirrors the reference's four extractor entry points with their positional CLI
(reference: Dataset/Dataset_creation/Dataset_creation_audio.py:277-284):

    python scripts/extract_dataset.py KIND ROOT OUT [SR]

KIND in {audio, tactile, audio_raw, tactile_raw}.
"""

import sys

import _common  # noqa: F401  (sys.path setup)

from multimodal_vqvae_compression_audio_tactile_tpu.data.mat_extract import (
    extract_corpus,
)


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    kind, root, out = sys.argv[1:4]
    sr = int(sys.argv[4]) if len(sys.argv) > 4 else None
    extract_corpus(root, out, kind, sr=sr)


if __name__ == "__main__":
    main()
