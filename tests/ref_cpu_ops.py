"""Compile the REFERENCE's own CPU kernels (nms, ROIAlign forward) for
whole-model parity tests.

The reference ships CPU implementations of its two hot custom ops
(/root/reference/pysgg/csrc/cpu/nms_cpu.cpp, ROIAlign_cpu.cpp) that the
`pysgg._C` extension would normally expose.  They were written against
torch 1.x C++ APIs (`Tensor::data<T>()`, `Tensor::type()` in dispatch
macros) that torch 2.13 removed, so we copy them to a build directory,
apply the standard mechanical modernizations (the same renames torch's
own upgrade guide prescribes: .data<T>() -> .data_ptr<T>(), x.type() in
AT_DISPATCH/type checks -> x.scalar_type()/x.is_cuda()), add a minimal
pybind module, and build with torch.utils.cpp_extension.  The NUMERIC
CODE is byte-for-byte the reference's.

Used by tests/test_whole_model_parity.py to stand in for `pysgg._C` so
the reference's full GeneralizedRCNN runs unmodified on CPU.
"""

import hashlib
import os
import re
import shutil

REF_CSRC = "/root/reference/pysgg/csrc/cpu"
BUILD_ROOT = "/tmp/veto_ref_cpu_ops"

_BINDING = """
#include <torch/extension.h>
#include "vision.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("nms", &nms_cpu, "reference CPU nms");
  m.def("roi_align_forward", &ROIAlign_forward_cpu,
        "reference CPU ROIAlign forward");
}
"""

# torch-1.x -> 2.x mechanical API renames (no semantic change)
_MODERNIZE = (
    (re.compile(r"\.data<([^>]+)>\(\)"), r".data_ptr<\1>()"),
    (re.compile(r"(\w+)\.type\(\)\.is_cuda\(\)"), r"\1.is_cuda()"),
    (re.compile(r"(\w+)\.type\(\)\s*==\s*(\w+)\.type\(\)"),
     r"\1.scalar_type() == \2.scalar_type()"),
    # AT_DISPATCH_FLOATING_TYPES(x.type(), ...) -> (x.scalar_type(), ...)
    (re.compile(r"AT_DISPATCH_FLOATING_TYPES\((\w+)\.type\(\)"),
     r"AT_DISPATCH_FLOATING_TYPES(\1.scalar_type()"),
)


def _modernized(src: str) -> str:
    for pat, rep in _MODERNIZE:
        src = pat.sub(rep, src)
    return src


def load_ref_cpu_ops():
    """Build (cached) and return the module with nms/roi_align_forward."""
    sources = ["nms_cpu.cpp", "ROIAlign_cpu.cpp"]
    h = hashlib.sha1()
    for f in sources + ["vision.h"]:
        with open(os.path.join(REF_CSRC, f), "rb") as fh:
            h.update(fh.read())
    h.update(_BINDING.encode())
    build_dir = os.path.join(BUILD_ROOT, h.hexdigest()[:12])
    os.makedirs(build_dir, exist_ok=True)
    for f in sources:
        dst = os.path.join(build_dir, f)
        if not os.path.exists(dst):
            with open(os.path.join(REF_CSRC, f)) as fh:
                src = _modernized(fh.read())
            with open(dst + ".tmp", "w") as fh:
                fh.write(src)
            os.replace(dst + ".tmp", dst)
    # the sources include "cpu/vision.h"
    os.makedirs(os.path.join(build_dir, "cpu"), exist_ok=True)
    for hdr in (os.path.join(build_dir, "vision.h"),
                os.path.join(build_dir, "cpu", "vision.h")):
        if not os.path.exists(hdr):
            shutil.copy(os.path.join(REF_CSRC, "vision.h"), hdr)
    binding = os.path.join(build_dir, "binding.cpp")
    if not os.path.exists(binding):
        with open(binding + ".tmp", "w") as fh:
            fh.write(_BINDING)
        os.replace(binding + ".tmp", binding)

    from torch.utils.cpp_extension import load

    return load(
        name="ref_cpu_ops",
        sources=[binding] + [os.path.join(build_dir, f) for f in sources],
        build_directory=build_dir,
        verbose=False,
    )


if __name__ == "__main__":
    import torch

    mod = load_ref_cpu_ops()
    boxes = torch.tensor(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=torch.float32
    )
    scores = torch.tensor([0.9, 0.8, 0.7])
    print("nms keep:", mod.nms(boxes, scores, 0.5))
    feat = torch.arange(64, dtype=torch.float32).reshape(1, 1, 8, 8)
    rois = torch.tensor([[0.0, 0, 0, 4, 4]])
    print("roi_align:", mod.roi_align_forward(feat, rois, 1.0, 2, 2, 2))
