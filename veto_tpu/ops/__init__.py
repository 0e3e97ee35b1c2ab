from . import box_ops, nms, roi_align

__all__ = ["box_ops", "nms", "roi_align"]
