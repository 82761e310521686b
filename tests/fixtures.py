"""Synthetic LibriSpeech-layout fixture (SURVEY.md §4: 2-utterance fake
LibriSpeech for end-to-end recipe tests on CPU)."""

import os

import numpy as np

from speech_anonymization_tpu.data.audio import write_wav

SR = 16000

# speaker -> (sex, f0): males low pitch, females high pitch so the gender
# task is learnable from tiny data
SPEAKERS = {
    "19": ("M", 110.0),
    "26": ("M", 130.0),
    "32": ("F", 220.0),
    "39": ("F", 250.0),
}

WORDS = ["HELLO", "WORLD", "SPEECH", "MODEL", "TEST", "AUDIO"]


def make_fake_librispeech(root: str, split: str = "train-clean", utts_per_speaker: int = 3,
                          duration_s: float = 1.0, seed: int = 0) -> str:
    """Create <root>/<split>/<spk>/<chap>/... wavs + trans + SPEAKERS.TXT."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "SPEAKERS.TXT"), "w") as f:
        f.write("; speaker | sex | subset\n")
        for spk, (sex, _) in SPEAKERS.items():
            f.write(f"{spk} | {sex} | {split}\n")
    for spk, (sex, f0) in SPEAKERS.items():
        chap = "100"
        chap_dir = os.path.join(root, split, spk, chap)
        os.makedirs(chap_dir, exist_ok=True)
        trans_lines = []
        for u in range(utts_per_speaker):
            utt_id = f"{spk}-{chap}-{u:04d}"
            n = int(SR * duration_s) + rng.integers(-800, 800)
            t = np.arange(n) / SR
            # harmonic tone at speaker f0 + noise
            wav = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
            wav += 0.02 * rng.standard_normal(n)
            write_wav(os.path.join(chap_dir, utt_id + ".wav"), wav, SR)
            text = " ".join(rng.choice(WORDS, size=3))
            trans_lines.append(f"{utt_id} {text}")
        with open(os.path.join(chap_dir, f"{spk}-{chap}.trans.txt"), "w") as f:
            f.write("\n".join(trans_lines) + "\n")
    return root
