from .modeling import (
    BERT_CONFIGS,
    BertConfig,
    BertForPreTraining,
    BertForQuestionAnswering,
    BertForMultipleChoice,
    BertForSequenceClassification,
    BertModel,
)
from .task import BertPretrainTask, BertSquadTask
