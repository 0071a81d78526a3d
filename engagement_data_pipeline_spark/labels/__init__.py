"""Message & label data model: schemas, code schemes, imputation,
column views.

The reference models each answer as a Firestore "Message" document
carrying a newest-first list of labels (SURVEY §1.1-1.2). Here the
same model is a nested Spark schema — `labels` stays an
`array<struct>` column manipulated with higher-order functions, never
exploded except where pivoting requires it.
"""

from .schema import (  # noqa: F401
    LABEL_TYPE,
    LABELS_TYPE,
    ORIGIN_TYPE,
    MESSAGE_SCHEMA,
    empty_labels,
    make_label,
)
