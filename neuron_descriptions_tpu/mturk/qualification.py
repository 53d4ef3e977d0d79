"""MTurk qualification-test tooling (reference: src/mturk/qualification.py).

A qualification test is a YAML config (title, instructions, multiple-choice
questions over images) compiled into the MTurk QuestionForm / AnswerKey XML
schemas, plus an HTML mockup for previewing.
"""
import dataclasses
import pathlib
from typing import Sequence
from urllib import request

__all__ = [
    "Question",
    "Config",
    "parse_yaml_config",
    "generate_questions_xml",
    "generate_answers_xml",
    "generate_mockup_html",
]

QUESTION_FORM_XMLNS = (
    "http://mechanicalturk.amazonaws.com/"
    "AWSMechanicalTurkDataSchemas/2017-11-06/QuestionForm.xsd")
ANSWER_KEY_XMLNS = ("http://mechanicalturk.amazonaws.com/"
                    "AWSMechanicalTurkDataSchemas/2005-10-01/AnswerKey.xsd")


@dataclasses.dataclass(frozen=True)
class Question:
    """A qualification question."""

    question_id: str
    image_urls: Sequence[str]
    options: Sequence[str]
    answer_index: int


@dataclasses.dataclass(frozen=True)
class Config:
    """A qualification test."""

    title: str
    instructions: str
    questions: Sequence[Question]


def parse_yaml_config(yaml_file: pathlib.Path,
                      validate_urls: bool = True,
                      display_progress: bool = True) -> Config:
    """Parse and validate a qualification YAML config
    (reference: qualification.py:41-137)."""
    del display_progress
    import yaml

    with pathlib.Path(yaml_file).open("r") as config_file:
        config = yaml.safe_load(config_file)

    title = config.get("title")
    if not isinstance(title, str):
        raise ValueError('"title" is required as str')
    instructions = config.get("instructions")
    if not isinstance(instructions, str):
        raise ValueError('"instructions" is required as str')
    question_configs = config.get("questions")
    if not question_configs or not isinstance(question_configs, list):
        raise ValueError("must add >= 1 questions in list")

    questions = []
    for question_config in question_configs:
        question_id = question_config.get("id")
        if not isinstance(question_id, str):
            raise ValueError('question "id" required as str')

        image_urls = question_config.get("image_urls")
        if not isinstance(image_urls, list) or len(image_urls) < 1:
            raise ValueError('question "image_urls" required as nonempty '
                             "list")
        for index, image_url in enumerate(image_urls):
            if not isinstance(image_url, str):
                raise ValueError(f"image_urls item {index} must be str")
            if validate_urls:
                code = request.urlopen(image_url).getcode()
                if code != 200:
                    raise ValueError(f"bad url (code {code}): {image_url}")

        options = question_config.get("options")
        if not isinstance(options, list) or len(options) < 2:
            raise ValueError('question "options" requires >= 2 entries')
        for index, option in enumerate(options):
            if not isinstance(option, str):
                raise ValueError(f"options item {index} must be str")

        answer_index = question_config.get("answer_index")
        if not isinstance(answer_index, int):
            raise ValueError('question "answer_index" required as int')
        if answer_index < 0 or answer_index >= len(options):
            raise ValueError(f"answer_index {answer_index} out of bounds "
                             f"given there are {len(options)} answer options")

        questions.append(
            Question(question_id=question_id, image_urls=tuple(image_urls),
                     options=tuple(options), answer_index=answer_index))

    return Config(title=title, instructions=instructions,
                  questions=tuple(questions))


def generate_questions_xml(test: Config) -> str:
    """Compile the test to MTurk QuestionForm XML
    (reference: qualification.py:140-202)."""
    lines = [
        f'<QuestionForm xmlns="{QUESTION_FORM_XMLNS}">',
        "<Overview>",
        "<Title>", test.title, "</Title>",
        "<Text>", test.instructions, "</Text>",
        "</Overview>",
    ]
    for index, question in enumerate(test.questions):
        lines += [
            "<Question>",
            "<QuestionIdentifier>", question.question_id,
            "</QuestionIdentifier>",
            "<DisplayName>", f"Question {index + 1}", "</DisplayName>",
            "<IsRequired>true</IsRequired>",
            "<QuestionContent>",
            "<FormattedContent><![CDATA[",
            "<table><tr>",
        ]
        for image_index, image_url in enumerate(question.image_urls):
            lines.append(
                "<td>"
                f'<img src="{image_url}" alt="image {image_index + 1}"/>'
                "</td>")
        lines += [
            "</tr></table>",
            "]]></FormattedContent>",
            "</QuestionContent>",
            "<AnswerSpecification>",
            "<SelectionAnswer>",
            "<Selections>",
        ]
        for option in question.options:
            lines += [
                "<Selection>",
                "<SelectionIdentifier>", option.replace(" ", "_"),
                "</SelectionIdentifier>",
                "<Text>", option, "</Text>",
                "</Selection>",
            ]
        lines += [
            "</Selections>",
            "</SelectionAnswer>",
            "</AnswerSpecification>",
            "</Question>",
        ]
    lines.append("</QuestionForm>")
    return "\n".join(lines)


def generate_answers_xml(test: Config) -> str:
    """Compile the answer key to MTurk AnswerKey XML
    (reference: qualification.py:205-243)."""
    lines = [f'<AnswerKey xmlns="{ANSWER_KEY_XMLNS}">']
    for question in test.questions:
        lines += [
            "<Question>",
            "<QuestionIdentifier>", question.question_id,
            "</QuestionIdentifier>",
            "<AnswerOption>",
            "<SelectionIdentifier>",
            question.options[question.answer_index].replace(" ", "_"),
            "</SelectionIdentifier>",
            "<AnswerScore>1</AnswerScore>",
            "</AnswerOption>",
            "</Question>",
        ]
    lines += [
        "<QualificationValueMapping>",
        "<PercentageMapping>",
        f"<MaximumSummedScore>{len(test.questions)}</MaximumSummedScore>",
        "</PercentageMapping>",
        "</QualificationValueMapping>",
        "</AnswerKey>",
    ]
    return "\n".join(lines)


def generate_mockup_html(test: Config) -> str:
    """Render an HTML preview of the test
    (reference: qualification.py:246-283)."""
    lines = [
        "<!DOCTYPE html>",
        "<html>",
        "<body>",
        f"<h2>{test.title}</h2>",
        f"<p>{test.instructions}</p>",
    ]
    for index, question in enumerate(test.questions):
        lines.append(f"<h3>Question {index + 1}</h3>")
        lines.append("<table><tr>")
        for image_url in question.image_urls:
            lines.append(f'<td><img src="{image_url}"/></td>')
        lines.append("</tr></table>")
        lines.append('<ol type="A">')
        for option in question.options:
            lines.append(
                f'<li>{option} (id {option.replace(" ", "_")})</li>')
        lines.append("</ol>")
    lines += ["</body>", "</html>"]
    return "\n".join(lines)
