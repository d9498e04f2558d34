"""Model families: YOLOv8-class detector, Florence-2-class captioner, OCR det/rec."""
