"""Generate a synthetic samples.jsonl + wavs for air-gapped smoke runs.

Usage: python example/make_synthetic_samples.py --output_dir /tmp/demo --n 24
"""

import argparse
import json
import os

import numpy as np
from scipy.io import wavfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args()
    wav_dir = os.path.join(args.output_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(args.output_dir, "samples.jsonl"), "w") as f:
        for i in range(args.n):
            dur = 0.5 + 2.5 * rng.random()
            n = int(args.sample_rate * dur)
            t = np.arange(n) / args.sample_rate
            f0 = 120 + 20 * (i % 8)
            wav = sum(
                a * np.sin(2 * np.pi * f0 * k * t)
                for k, a in ((1, 0.4), (2, 0.2), (3, 0.1))
            ) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
            wav = (wav + 0.02 * rng.standard_normal(n)).astype(np.float32)
            path = os.path.join(wav_dir, f"audio_{i}.wav")
            wavfile.write(path, args.sample_rate, (wav * 32767).astype(np.int16))
            f.write(
                json.dumps(
                    {
                        "wav_path": path,
                        "transcript": f"This is synthetic utterance number {i}.",
                        "language": "en",
                        "duration": dur,
                        "sample_rate": args.sample_rate,
                    }
                )
                + "\n"
            )
    print(f"wrote {args.n} samples to {args.output_dir}")


if __name__ == "__main__":
    main()
