"""Load reference pipeline modules from /root/reference with stubbed deps.

Test oracle infrastructure ONLY (never imported by package code): the
reference's host-side stitching / clustering / binarization math decides the
DER-parity gate (SURVEY.md section 7 "hard parts"), so tests exercise the
actual reference functions against diarizen_tpu reimplementations.

The pyannote.core shim below implements the exact subset of pyannote.core
semantics the loaded reference functions touch (closest_frame rounding,
SlidingWindowFeature ufunc dispatch, Annotation.support merging, loose-mode
crop index math). Reference call sites:
  - pyannote-audio/pyannote/audio/core/inference.py:543-713 (aggregate/trim)
  - pyannote-audio/pyannote/audio/pipelines/utils/diarization.py:121-239
  - pyannote-audio/pyannote/audio/pipelines/clustering.py:47-513
  - pyannote-audio/pyannote/audio/utils/signal.py:44-374
  - diarizen/clustering/VBx.py
"""

from __future__ import annotations

import enum
import importlib.util
import itertools
import os
import sys
import types

import numpy as np

REF = "/root/reference"
REF_PA = f"{REF}/pyannote-audio/pyannote/audio"

HAVE_REFERENCE = os.path.isdir(REF_PA)


# --------------------------------------------------------------------------
# minimal faithful pyannote.core
# --------------------------------------------------------------------------

class Segment:
    """pyannote.core.Segment subset: start/end/duration/middle, bool, & | ^."""

    __slots__ = ("start", "end")

    def __init__(self, start: float, end: float):
        self.start = float(start)
        self.end = float(end)

    @property
    def duration(self) -> float:
        return self.end - self.start if self else 0.0

    @property
    def middle(self) -> float:
        return 0.5 * (self.start + self.end)

    def __bool__(self) -> bool:
        # pyannote: non-empty iff end - start > SEGMENT_PRECISION (~1e-6 via round)
        return bool(self.end - self.start > 0)

    def __and__(self, other: "Segment") -> "Segment":
        return Segment(max(self.start, other.start), min(self.end, other.end))

    def __or__(self, other: "Segment") -> "Segment":
        return Segment(min(self.start, other.start), max(self.end, other.end))

    def __xor__(self, other: "Segment") -> "Segment":
        # gap between two segments
        return Segment(min(self.end, other.end), max(self.start, other.start))

    def _key(self):
        return (self.start, self.end)

    def __eq__(self, other):
        return isinstance(other, Segment) and self._key() == other._key()

    def __lt__(self, other):
        return self._key() < other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"<Segment({self.start:g}, {self.end:g})>"


class SlidingWindow:
    def __init__(self, duration=0.03, step=0.01, start=0.0, end=None):
        self.duration = duration
        self.step = step
        self.start = start
        self.end = end

    def closest_frame(self, t: float) -> int:
        return int(np.rint((t - self.start - 0.5 * self.duration) / self.step))

    def __getitem__(self, i: int) -> Segment:
        s = self.start + i * self.step
        return Segment(s, s + self.duration)

    def crop(self, focus: Segment, mode: str = "loose", fixed=None,
             return_ranges: bool = False):
        """Frame-index range(s) of windows vs a focus segment
        (pyannote.core sliding_window.py semantics; fixed unsupported)."""
        assert fixed is None
        if mode == "loose":
            i = int(np.ceil((focus.start - self.duration - self.start) / self.step))
            j = int(np.floor((focus.end - self.start) / self.step))
            rng = (i, j + 1)
        elif mode == "strict":
            i = int(np.ceil((focus.start - self.start) / self.step))
            j = int(np.floor((focus.end - self.duration - self.start) / self.step))
            rng = (i, j + 1)
        elif mode == "center":
            i = self.closest_frame(focus.start)
            j = self.closest_frame(focus.end)
            rng = (i, j + 1)
        else:
            raise ValueError(mode)
        if return_ranges:
            return [list(rng)]
        return np.arange(max(0, rng[0]), rng[1])


class SlidingWindowFeature(np.lib.mixins.NDArrayOperatorsMixin):
    def __init__(self, data, sliding_window, labels=None):
        self.data = np.asarray(data) if not isinstance(data, np.ndarray) else data
        self.sliding_window = sliding_window
        self.labels = labels

    def __len__(self):
        return self.data.shape[0]

    @property
    def extent(self) -> Segment:
        n = self.data.shape[0]
        sw = self.sliding_window
        return Segment(sw.start, sw.start + (n - 1) * sw.step + sw.duration)

    def __iter__(self):
        for i in range(len(self)):
            yield self.sliding_window[i], self.data[i]

    def __getitem__(self, i):
        return self.data[i]

    def __array__(self, dtype=None):
        return np.asarray(self.data, dtype=dtype)

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        """pyannote.core dispatch: ufunc results stay SlidingWindowFeature
        when the frame axis survives (this is what makes np.isnan(swf),
        1 - swf and np.sum(swf, axis=-1) behave in the reference code)."""
        arrays = [
            np.asarray(x) if isinstance(x, SlidingWindowFeature) else x
            for x in inputs
        ]
        out = getattr(ufunc, method)(*arrays, **kwargs)
        if isinstance(out, np.ndarray) and out.ndim > 0 and out.shape[0] == self.data.shape[0]:
            return SlidingWindowFeature(out, self.sliding_window)
        return out

    def crop(self, focus: Segment, mode: str = "loose", fixed=None,
             return_data: bool = True):
        ranges = self.sliding_window.crop(
            focus, mode=mode, fixed=fixed, return_ranges=True
        )
        n = self.data.shape[0]
        clipped = [[max(s, 0), min(e, n)] for s, e in ranges if e >= 0 and s < n]
        if clipped:
            data = np.vstack([self.data[s:e] for s, e in clipped])
        else:
            data = np.empty((0,) + self.data.shape[1:], dtype=self.data.dtype)
        if return_data:
            return data
        first = ranges[0][0]
        sw = self.sliding_window
        new_sw = SlidingWindow(
            start=sw[max(0, first)].start, duration=sw.duration, step=sw.step
        )
        return SlidingWindowFeature(data, new_sw)


class Timeline:
    def __init__(self, segments=None, uri=None):
        self.uri = uri
        self.segments = sorted(segments or [])

    def add(self, segment: Segment):
        self.segments.append(segment)
        self.segments.sort()

    def __iter__(self):
        return iter(self.segments)

    def __len__(self):
        return len(self.segments)

    def support(self, collar: float = 0.0) -> "Timeline":
        if not self.segments:
            return Timeline()
        merged = []
        current = self.segments[0]
        for seg in self.segments[1:]:
            gap = current ^ seg
            if (not gap) or gap.duration < collar:
                current = current | seg
            else:
                merged.append(current)
                current = seg
        merged.append(current)
        return Timeline(merged)


class Annotation:
    """dict-of-dicts {segment: {track: label}} like pyannote.core.Annotation."""

    def __init__(self, uri=None, modality=None):
        self.uri = uri
        self.modality = modality
        self._tracks = {}  # Segment -> {track: label}

    def __setitem__(self, key, label):
        segment, track = key
        self._tracks.setdefault(segment, {})[track] = label

    def __delitem__(self, key):
        segment, track = key
        del self._tracks[segment][track]
        if not self._tracks[segment]:
            del self._tracks[segment]

    def itertracks(self, yield_label: bool = False):
        for segment in sorted(self._tracks):
            for track in sorted(self._tracks[segment], key=str):
                if yield_label:
                    yield segment, track, self._tracks[segment][track]
                else:
                    yield segment, track

    def labels(self):
        return sorted(
            {lab for tracks in self._tracks.values() for lab in tracks.values()},
            key=str,
        )

    def label_timeline(self, label, copy: bool = True) -> Timeline:
        return Timeline(
            [seg for seg, tracks in self._tracks.items()
             if label in tracks.values()]
        )

    def support(self, collar: float = 0.0) -> "Annotation":
        out = Annotation(uri=self.uri)
        counter = itertools.count()
        for label in self.labels():
            for seg in self.label_timeline(label).support(collar):
                out[seg, next(counter)] = label
        return out

    def rename_tracks(self, generator="string") -> "Annotation":
        out = Annotation(uri=self.uri)
        names = itertools.count()
        for seg, track, label in self.itertracks(yield_label=True):
            out[seg, str(next(names))] = label
        return out

    def __len__(self):
        return len(self._tracks)


class Resolution(enum.Enum):
    """pyannote.audio.core.task.Resolution subset (task.py:70-72)."""

    FRAME = 1
    CHUNK = 2


class Problem(enum.Enum):
    """pyannote.audio.core.task.Problem subset (task.py:58-64)."""

    BINARY_CLASSIFICATION = 0
    MONO_LABEL_CLASSIFICATION = 1
    MULTI_LABEL_CLASSIFICATION = 2


class Specifications:
    """Faithful pyannote Specifications subset (core/task.py:80-137): the
    attributes + powerset/num_powerset_classes properties + single-spec
    iteration protocol that Inference.__init__ and slide() rely on."""

    def __init__(self, problem, resolution, duration, min_duration=None,
                 warm_up=(0.0, 0.0), classes=None, powerset_max_classes=None,
                 permutation_invariant=False):
        self.problem = problem
        self.resolution = resolution
        self.duration = duration
        self.min_duration = min_duration
        self.warm_up = warm_up
        self.classes = classes
        self.powerset_max_classes = powerset_max_classes
        self.permutation_invariant = permutation_invariant

    @property
    def powerset(self) -> bool:
        return self.powerset_max_classes is not None

    @property
    def num_powerset_classes(self) -> int:
        import scipy.special

        return int(sum(scipy.special.binom(len(self.classes), i)
                       for i in range(0, self.powerset_max_classes + 1)))

    def __len__(self):
        return 1

    def __iter__(self):
        yield self


def map_with_specifications(specifications, func, *iterables):
    """Faithful utils/multi_task.py:29-60: pass the specification through as
    a keyword so spec-dependent callbacks (Inference.slide's __frames /
    __aggregate) see it."""
    if isinstance(specifications, tuple):
        return tuple(
            func(*i, specifications=s) for s, *i in zip(specifications, *iterables)
        )
    return func(*iterables, specifications=specifications)


def annotation_tuples(ann) -> list:
    """(start, end, label) rows from either a shim Annotation or a
    diarizen_tpu Annotation — the cross-framework comparison format."""
    rows = []
    for seg, _track, label in ann.itertracks(yield_label=True):
        rows.append((round(seg.start, 9), round(seg.end, 9), str(label)))
    return sorted(rows)


# --------------------------------------------------------------------------
# module loading
# --------------------------------------------------------------------------

def _module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load(name, path):
    if name in sys.modules and getattr(sys.modules[name], "__file__", None) == path:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        del sys.modules[name]
        raise
    return mod


_installed = False


def install_shim():
    """Register pyannote.core / pyannote.pipeline / misc stubs in sys.modules
    (idempotent; cooperates with test_embedding.py's empty package stubs)."""
    global _installed
    # reference code predates NumPy 2.0 (np.NaN/np.NAN were removed)
    np.NaN = np.nan
    np.NAN = np.nan
    core_attrs = dict(
        Segment=Segment, SlidingWindow=SlidingWindow,
        SlidingWindowFeature=SlidingWindowFeature,
        Timeline=Timeline, Annotation=Annotation,
    )
    _module("pyannote")
    _module("pyannote.core", **core_attrs)
    _module("pyannote.core.utils")
    def _pairwise(iterable):
        items = list(iterable)
        return zip(items, items[1:])

    _module("pyannote.core.utils.generators",
            pairwise=_pairwise,
            string_generator=lambda: iter(f"{i}" for i in itertools.count()))
    _module("pyannote.core.utils.types", Label=str)

    class _Param:
        def __init__(self, *a, **k):
            pass

    _module("pyannote.pipeline", Pipeline=type("Pipeline", (), {}))
    _module("pyannote.pipeline.parameter",
            Categorical=_Param, Integer=_Param, Uniform=_Param,
            ParamDict=_Param)

    _module("pyannote.metrics")
    _module("pyannote.metrics.diarization",
            DiarizationErrorRate=type("DiarizationErrorRate", (), {}))

    if "pytorch_lightning" not in sys.modules:
        _module("pytorch_lightning")
        _module("pytorch_lightning.utilities")
        _module("pytorch_lightning.utilities.memory",
                is_oom_error=lambda e: False)

    # pyannote.audio package tree with attribute stubs used at import time
    _module("pyannote.audio")
    _module("pyannote.audio.core")
    _module("pyannote.audio.core.io", AudioFile=dict, Audio=object)
    _module("pyannote.audio.core.model", Model=object,
            Specifications=Specifications)
    _module("pyannote.audio.core.task", Resolution=Resolution,
            Specifications=Specifications, Problem=Problem)
    _module("pyannote.audio.utils")
    _module("pyannote.audio.utils.multi_task",
            map_with_specifications=map_with_specifications)
    _module("pyannote.audio.utils.reproducibility",
            fix_reproducibility=lambda device: None)
    _module("pyannote.audio.pipelines")
    _module("pyannote.audio.pipelines.utils",
            oracle_segmentation=None)
    _module("diarizen")
    _module("diarizen.clustering")
    _installed = True


def load_ref_vbx():
    install_shim()
    return _load("diarizen.clustering.VBx", f"{REF}/diarizen/clustering/VBx.py")


def load_ref_inference():
    """Reference Inference class (aggregate/trim static methods)."""
    install_shim()
    import torch  # noqa: F401  (needed by the module)

    _load("pyannote.audio.utils.powerset", f"{REF_PA}/utils/powerset.py")
    return _load("pyannote.audio.core.inference", f"{REF_PA}/core/inference.py")


def load_ref_signal():
    install_shim()
    return _load("pyannote.audio.utils.signal", f"{REF_PA}/utils/signal.py")


def load_ref_diarization():
    """Reference SpeakerDiarizationMixin (speaker_count/to_diarization)."""
    load_ref_inference()
    load_ref_signal()
    return _load(
        "pyannote.audio.pipelines.utils.diarization",
        f"{REF_PA}/pipelines/utils/diarization.py",
    )


def load_ref_permutation():
    """Reference permutate()/mae_cost_func/mse_cost_func."""
    install_shim()
    return _load(
        "pyannote.audio.utils.permutation", f"{REF_PA}/utils/permutation.py"
    )


def load_ref_clustering():
    """Reference clustering module (BaseClustering/AgglomerativeClustering/
    VBxClustering/OracleClustering)."""
    install_shim()
    load_ref_vbx()
    _load("pyannote.audio.utils.permutation", f"{REF_PA}/utils/permutation.py")
    return _load(
        "pyannote.audio.pipelines.clustering", f"{REF_PA}/pipelines/clustering.py"
    )


def load_ref_speaker_diarization():
    """Reference SpeakerDiarization pipeline class (for reconstruct + the
    stage-4..7 end-to-end oracle). Instantiate with __new__ and set the
    attributes the exercised methods read."""
    inference_mod = load_ref_inference()
    diar_mod = load_ref_diarization()
    clustering_mod = load_ref_clustering()

    _module("pyannote.audio",
            Audio=object, Inference=inference_mod.Inference,
            Model=object, Pipeline=sys.modules["pyannote.pipeline"].Pipeline)
    _module("pyannote.metrics.diarization",
            GreedyDiarizationErrorRate=type("GreedyDiarizationErrorRate", (), {}))
    _module("pyannote.audio.pipelines.utils",
            PipelineModel=object,
            SpeakerDiarizationMixin=diar_mod.SpeakerDiarizationMixin,
            get_model=None)
    _module("pyannote.audio.pipelines.speaker_verification",
            PretrainedSpeakerEmbedding=object)
    sys.modules["pyannote.audio.pipelines.clustering"] = clustering_mod
    return _load(
        "pyannote.audio.pipelines.speaker_diarization",
        f"{REF_PA}/pipelines/speaker_diarization.py",
    )
