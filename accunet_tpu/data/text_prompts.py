"""Text-prompt annotations for the text-conditioned SegMamba variants.

Parity target: /root/reference/Experiments/train_model.py:191-261 (read_text)
— finds an .xlsx (here also .csv) in the dataset folder, accepts the three
column conventions, returns {image_filename: prompt}.
"""

from __future__ import annotations

import os

_COLUMN_PAIRS = [
    ("Filename", "Text"),
    ("image_name", "prompt_text"),
    ("Image", "Description"),
]


def read_text(folder_path: str) -> dict[str, str] | None:
    files = [
        f for f in sorted(os.listdir(folder_path))
        if f.endswith((".xlsx", ".csv"))
    ]
    if not files:
        return None
    path = os.path.join(folder_path, files[0])

    import pandas as pd

    df = pd.read_excel(path) if path.endswith(".xlsx") else pd.read_csv(path)
    for fcol, tcol in _COLUMN_PAIRS:
        if fcol in df.columns and tcol in df.columns:
            break
    else:
        raise ValueError(
            f"text file {path} lacks expected columns; found {list(df.columns)}"
        )

    out = {}
    for _, row in df.iterrows():
        fname = str(row[fcol]).strip()
        if not fname.endswith(".png"):
            fname = fname.replace(".jpg", ".png")
        out[fname] = str(row[tcol]).strip()
    return out
