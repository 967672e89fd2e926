"""Device-side compute: kernel math, segment SGD, ALS, similarity, top-k."""
