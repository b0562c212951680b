from ent_res_feedback_spark.functions import hashing, strdist, text, vectors  # noqa: F401
