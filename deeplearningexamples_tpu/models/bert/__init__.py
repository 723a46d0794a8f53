from .modeling import (
    BERT_CONFIGS,
    BertConfig,
    BertForPreTraining,
    BertForQuestionAnswering,
    BertForSequenceClassification,
    BertModel,
)
from .task import BertPretrainTask, BertSquadTask
