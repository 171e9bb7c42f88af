"""Model constants shared across the framework.

Behavioral parity with the reference constants (reference:
revisionllm/constants.py:7-16): sentinel token ids spliced into the token
stream stand for "insert video features here" (-200) and "insert memory
features here" (-300); -100 marks positions excluded from the LM loss.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
MEMORY_TOKEN_INDEX = -300

DEFAULT_IMAGE_TOKEN = "<video>"
DEFAULT_MEMORY_TOKEN = "<memory>"
DEFAULT_IGNORE_TOKEN = "<ignore>"

# Natural-language prefixes injected ahead of the visual memory tokens in the
# streaming-memory training mode (reference: revisionllm/constants.py:14-15,
# used by revisionllm/train/vtimellm_trainer.py:117-121). Index 0 = negative
# memory (event did not occur), index 1 = positive.
PREFIX = [
    "Here is an example of a past memory where the event did not occur: ",
    "Here is an example of a past memory where the event did take place: ",
]

# Question templates used by the eval drivers
# (reference: revisionllm/eval/eval_nlq_negative.py:127-132,
#  revisionllm/eval/eval_nlq_retrieval_e2e2.py:154-159,329).
QUESTIONS = {
    "mad_grounding": "During which frames can we see {}?",
    "ego_assertive": "During which frames {}?",
    "ego_question": "Find the start and end time of the Query from the Video.\nQuery: {}",
    "retrieval": "During which video can we see {}?",
}

# Answer string emitted for negative (event-absent) windows
# (reference: revisionllm/train/dataset.py:474).
NEGATIVE_ANSWER = "Not Present"
NEGATIVE_ANSWER_RETRIEVAL = "no"
