"""Interactive dataset viewer (reference datasets/view_dataset.py parity):
n = next, p = previous, q = quit."""

from __future__ import annotations

import cv2
import numpy as np

from mask_rcnn_tpu.utils.visualizations import draw_instance_bboxes


def view_dataset(dataset, class_names=None, window="dataset"):
    n_class = len(class_names) if class_names else 256
    i = 0
    while True:
        e = dataset[i]
        img, bboxes, labels, masks = e[:4]
        viz = draw_instance_bboxes(
            img, bboxes, labels, n_class, masks=np.asarray(masks, bool)
        )
        cv2.imshow(window, viz[:, :, ::-1])
        key = cv2.waitKey(0) & 0xFF
        if key == ord("q"):
            break
        if key == ord("n"):
            i = (i + 1) % len(dataset)
        elif key == ord("p"):
            i = (i - 1) % len(dataset)
    cv2.destroyWindow(window)
