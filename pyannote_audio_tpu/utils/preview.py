"""Notebook preview helpers: listen to and visualize annotations.

Parity: /root/reference/src/pyannote/audio/utils/preview.py (listen :67,
preview :92). The reference renders videos with moviepy (not in this
image); ``preview`` draws a matplotlib timeline figure instead, and
``listen`` returns an IPython Audio widget. Both degrade gracefully
outside notebooks.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..core.annotation import Annotation, Timeline
from ..core.io import Audio, AudioFile
from ..core.segment import Segment, SlidingWindowFeature


def listen(audio_file: AudioFile, segment: Optional[Segment] = None):
    """Play (a crop of) an audio file in a notebook."""
    audio = Audio(sample_rate=16000, mono="downmix")
    if segment is None:
        waveform, sample_rate = audio(audio_file)
    else:
        waveform, sample_rate = audio.crop(audio_file, segment)
    try:
        from IPython.display import Audio as IPythonAudio
        return IPythonAudio(waveform[0], rate=sample_rate, autoplay=False)
    except ImportError:
        return waveform, sample_rate


def preview(
    audio_file: AudioFile,
    segment: Optional[Segment] = None,
    *annotations: Union[Annotation, Timeline, SlidingWindowFeature],
):
    """Render waveform + annotations as a matplotlib figure."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise ImportError("preview requires matplotlib") from exc

    audio = Audio(sample_rate=16000, mono="downmix")
    if segment is None:
        waveform, sample_rate = audio(audio_file)
        segment = Segment(0, waveform.shape[1] / sample_rate)
    else:
        waveform, sample_rate = audio.crop(audio_file, segment)

    rows = 1 + len(annotations)
    fig, axes = plt.subplots(rows, 1, figsize=(10, 1.6 * rows),
                             sharex=True, squeeze=False)
    t = segment.start + np.arange(waveform.shape[1]) / sample_rate
    axes[0][0].plot(t, waveform[0], linewidth=0.3, color="gray")
    axes[0][0].set_ylabel("waveform")

    for i, ann in enumerate(annotations, start=1):
        ax = axes[i][0]
        if isinstance(ann, SlidingWindowFeature):
            window = ann.sliding_window
            times = [window[j].middle for j in range(len(ann.data))]
            ax.plot(times, ann.data, linewidth=0.8)
            ax.set_ylabel("scores")
            continue
        if isinstance(ann, Timeline):
            tmp = Annotation(uri=ann.uri)
            for seg in ann:
                tmp[seg, tmp.new_track(seg)] = "_"
            ann = tmp
        labels = ann.labels()
        for seg, _, label in ann.itertracks(yield_label=True):
            y = labels.index(label)
            ax.plot([seg.start, seg.end], [y, y], linewidth=6,
                    solid_capstyle="butt")
        ax.set_yticks(range(len(labels)))
        ax.set_yticklabels([str(label) for label in labels])
    axes[-1][0].set_xlabel("time (s)")
    axes[-1][0].set_xlim(segment.start, segment.end)
    fig.tight_layout()
    return fig
