"""Real-language training/held-out text for the LangId model.

All text here is public-domain or generic common usage: each language's
sample opens with its Universal Declaration of Human Rights Article 1
(UN text, public domain), followed by ordinary everyday sentences and a
high-frequency function-word list (language word-frequency rankings are
public knowledge; these are the classic closed-class words every
frequency list starts with).  The fixture exists so the shipped LangId
profiles are trained on ACTUAL language data rather than synthetic
separable tokens — the round-4 review's remaining model-data gap.

Train/held-out split is by SENTENCE: held-out text shares no sentence
with training text, so the pinned accuracy measures generalization, not
memorization.  ~6 languages keep the model small (a few thousand
n-grams per language) while covering the Latin-script confusion pairs
that actually matter (es/pt, fr/it).
"""

from __future__ import annotations

TRAIN: dict[str, list[str]] = {
    "en": [
        "All human beings are born free and equal in dignity and rights. "
        "They are endowed with reason and conscience and should act "
        "towards one another in a spirit of brotherhood.",
        "The weather this morning was cold and clear, so we walked to the "
        "market together and bought fresh bread for breakfast.",
        "She opened the window and looked out over the quiet street, "
        "wondering when the rain would finally stop.",
        "Most people agree that learning a new language takes time, "
        "patience, and a great deal of practice every day.",
        "The library closes at nine in the evening during the week and at "
        "five on Saturdays.",
        "He could not remember where he had left his keys, so he searched "
        "every room in the house twice.",
        "the of and to in a is that it was for on are with as his they be "
        "at one have this from or had by word but not what all were when "
        "we there can an your which their said if will each about how up "
        "out them then she many some so these would other into has more "
        "her two like him see time could no make than first been its who "
        "now people my made over did down only way find use may water long "
        "little very after words called just where most know",
    ],
    "de": [
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren. "
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im "
        "Geist der Brüderlichkeit begegnen.",
        "Das Wetter war heute Morgen kalt und klar, also sind wir "
        "zusammen zum Markt gelaufen und haben frisches Brot gekauft.",
        "Sie öffnete das Fenster und schaute auf die ruhige Straße "
        "hinaus, während sie sich fragte, wann der Regen endlich "
        "aufhören würde.",
        "Die meisten Leute sind sich einig, dass das Erlernen einer neuen "
        "Sprache Zeit, Geduld und viel tägliche Übung erfordert.",
        "Die Bibliothek schließt unter der Woche um neun Uhr abends und "
        "samstags um fünf.",
        "Er konnte sich nicht erinnern, wo er seine Schlüssel gelassen "
        "hatte, also durchsuchte er zweimal jedes Zimmer im Haus.",
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach "
        "wird bei einer um am sind noch wie einem über einen so zum war "
        "haben nur oder aber vor zur bis mehr durch man sein wurde sei "
        "seine ihre dann unter wir soll ich eines jahr zwei diese wieder "
        "keine uns zwischen immer millionen was sagte",
    ],
    "fr": [
        "Tous les êtres humains naissent libres et égaux en dignité et en "
        "droits. Ils sont doués de raison et de conscience et doivent "
        "agir les uns envers les autres dans un esprit de fraternité.",
        "Le temps était froid et clair ce matin, alors nous avons marché "
        "ensemble jusqu'au marché et acheté du pain frais.",
        "Elle a ouvert la fenêtre et a regardé la rue tranquille en se "
        "demandant quand la pluie allait enfin cesser.",
        "La plupart des gens reconnaissent qu'apprendre une nouvelle "
        "langue demande du temps, de la patience et beaucoup de pratique "
        "chaque jour.",
        "La bibliothèque ferme à neuf heures du soir en semaine et à "
        "cinq heures le samedi.",
        "Il ne se souvenait plus où il avait laissé ses clés, alors il a "
        "fouillé deux fois chaque pièce de la maison.",
        "de la le et les des en un du une que est pour qui dans a par "
        "plus pas au sur ne se ce il sont la aux avec son ont cette mais "
        "ou nous comme être fait elle tout deux ses même ans entre aussi "
        "leur bien sans peut cela après avoir leurs ainsi encore voir "
        "temps très depuis dont autres était où fois jour monde faire "
        "notre toujours moins rien celui dire",
    ],
    "es": [
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros.",
        "El tiempo estaba frío y despejado esta mañana, así que caminamos "
        "juntos al mercado y compramos pan fresco para el desayuno.",
        "Ella abrió la ventana y miró hacia la calle tranquila, "
        "preguntándose cuándo dejaría por fin de llover.",
        "La mayoría de la gente está de acuerdo en que aprender un nuevo "
        "idioma requiere tiempo, paciencia y mucha práctica todos los "
        "días.",
        "La biblioteca cierra a las nueve de la noche entre semana y a "
        "las cinco los sábados.",
        "No recordaba dónde había dejado sus llaves, así que registró dos "
        "veces todas las habitaciones de la casa.",
        "de la que el en y a los se del las un por con no una su para es "
        "al lo como más pero sus le ya o este sí porque esta entre cuando "
        "muy sin sobre también me hasta hay donde quien desde todo nos "
        "durante todos uno les ni contra otros ese eso ante ellos e esto "
        "mí antes algunos qué unos yo otro otras otra él tanto esa estos "
        "mucho quienes nada muchos cual poco ella estar",
    ],
    "it": [
        "Tutti gli esseri umani nascono liberi ed eguali in dignità e "
        "diritti. Essi sono dotati di ragione e di coscienza e devono "
        "agire gli uni verso gli altri in spirito di fratellanza.",
        "Il tempo stamattina era freddo e limpido, così abbiamo "
        "camminato insieme fino al mercato e comprato pane fresco per "
        "colazione.",
        "Lei aprì la finestra e guardò la strada tranquilla, chiedendosi "
        "quando la pioggia sarebbe finalmente cessata.",
        "La maggior parte delle persone concorda sul fatto che imparare "
        "una nuova lingua richiede tempo, pazienza e molta pratica ogni "
        "giorno.",
        "La biblioteca chiude alle nove di sera durante la settimana e "
        "alle cinque il sabato.",
        "Non ricordava dove avesse lasciato le chiavi, così frugò due "
        "volte in ogni stanza della casa.",
        "di e il la che a per in un è del con non sono da una le si dei "
        "come più nel alla lo gli ha anche della questo o ma se delle "
        "loro ai suo sua hanno essere nella fra dopo perché quando noi "
        "due anni stato questa sul tra era aveva molto ancora solo tutti "
        "già senza dove essi fare può così ogni altri quale parte tempo "
        "prima stata stati mentre contro tutto altro",
    ],
    "pt": [
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razão e de consciência, devem agir uns "
        "para com os outros em espírito de fraternidade.",
        "O tempo estava frio e limpo esta manhã, então caminhamos juntos "
        "até o mercado e compramos pão fresco para o café da manhã.",
        "Ela abriu a janela e olhou para a rua tranquila, perguntando-se "
        "quando a chuva finalmente pararia.",
        "A maioria das pessoas concorda que aprender uma nova língua "
        "exige tempo, paciência e muita prática todos os dias.",
        "A biblioteca fecha às nove da noite durante a semana e às cinco "
        "aos sábados.",
        "Ele não se lembrava de onde tinha deixado as chaves, então "
        "procurou duas vezes em todos os cômodos da casa.",
        "de a o que e do da em um para é com não uma os no se na por "
        "mais as dos como mas foi ao ele das tem à seu sua ou ser quando "
        "muito há nos já está eu também só pelo pela até isso ela entre "
        "era depois sem mesmo aos ter seus quem nas me esse eles estão "
        "você tinha foram essa num nem suas meu às minha têm numa pelos "
        "qual será nós tenho lhe deles essas esses pelas este",
    ],
}

HELD_OUT: dict[str, list[str]] = {
    "en": [
        "Nobody knew exactly why the old clock in the station had stopped "
        "working, but everyone had a theory about it.",
        "If you finish your work before noon, we can take the train to "
        "the coast and spend the afternoon by the sea.",
        "The children were reading quietly in the corner while their "
        "teacher wrote the next lesson on the board.",
        "A good breakfast usually makes the whole day feel easier, or at "
        "least that is what my grandmother always said.",
        "They have been building that bridge for three years and it is "
        "still not open to traffic.",
        "Please remember to bring your umbrella, because the forecast "
        "says it will rain all evening.",
    ],
    "de": [
        "Niemand wusste genau, warum die alte Uhr im Bahnhof stehen "
        "geblieben war, aber jeder hatte eine Theorie dazu.",
        "Wenn du deine Arbeit vor Mittag beendest, können wir den Zug "
        "zur Küste nehmen und den Nachmittag am Meer verbringen.",
        "Die Kinder lasen leise in der Ecke, während ihre Lehrerin die "
        "nächste Aufgabe an die Tafel schrieb.",
        "Ein gutes Frühstück macht den ganzen Tag leichter, zumindest "
        "hat das meine Großmutter immer gesagt.",
        "Sie bauen seit drei Jahren an dieser Brücke und sie ist immer "
        "noch nicht für den Verkehr freigegeben.",
        "Bitte denk daran, deinen Regenschirm mitzunehmen, denn laut "
        "Vorhersage wird es den ganzen Abend regnen.",
    ],
    "fr": [
        "Personne ne savait exactement pourquoi la vieille horloge de la "
        "gare s'était arrêtée, mais chacun avait sa théorie.",
        "Si tu termines ton travail avant midi, nous pourrons prendre le "
        "train pour la côte et passer l'après-midi au bord de la mer.",
        "Les enfants lisaient tranquillement dans le coin pendant que "
        "leur maîtresse écrivait la prochaine leçon au tableau.",
        "Un bon petit déjeuner rend la journée plus facile, du moins "
        "c'est ce que disait toujours ma grand-mère.",
        "Ils construisent ce pont depuis trois ans et il n'est toujours "
        "pas ouvert à la circulation.",
        "N'oublie pas de prendre ton parapluie, car la météo annonce de "
        "la pluie toute la soirée.",
    ],
    "es": [
        "Nadie sabía exactamente por qué el viejo reloj de la estación "
        "había dejado de funcionar, pero todos tenían una teoría.",
        "Si terminas tu trabajo antes del mediodía, podemos tomar el "
        "tren a la costa y pasar la tarde junto al mar.",
        "Los niños leían en silencio en el rincón mientras su maestra "
        "escribía la siguiente lección en la pizarra.",
        "Un buen desayuno hace que todo el día sea más fácil, o al menos "
        "eso decía siempre mi abuela.",
        "Llevan tres años construyendo ese puente y todavía no está "
        "abierto al tráfico.",
        "Por favor recuerda llevar tu paraguas, porque el pronóstico "
        "dice que lloverá toda la tarde.",
    ],
    "it": [
        "Nessuno sapeva esattamente perché il vecchio orologio della "
        "stazione avesse smesso di funzionare, ma tutti avevano una "
        "teoria.",
        "Se finisci il tuo lavoro prima di mezzogiorno, possiamo "
        "prendere il treno per la costa e passare il pomeriggio al mare.",
        "I bambini leggevano in silenzio nell'angolo mentre la loro "
        "maestra scriveva la prossima lezione alla lavagna.",
        "Una buona colazione rende tutta la giornata più facile, o "
        "almeno così diceva sempre mia nonna.",
        "Stanno costruendo quel ponte da tre anni e non è ancora aperto "
        "al traffico.",
        "Ricordati di portare l'ombrello, perché le previsioni dicono "
        "che pioverà tutta la sera.",
    ],
    "pt": [
        "Ninguém sabia exatamente por que o velho relógio da estação "
        "tinha parado de funcionar, mas todos tinham uma teoria.",
        "Se você terminar seu trabalho antes do meio-dia, podemos pegar "
        "o trem para o litoral e passar a tarde à beira-mar.",
        "As crianças liam em silêncio no canto enquanto a professora "
        "escrevia a próxima lição no quadro.",
        "Um bom café da manhã torna o dia inteiro mais fácil, ou pelo "
        "menos era o que a minha avó sempre dizia.",
        "Estão construindo aquela ponte há três anos e ela ainda não "
        "foi aberta ao tráfego.",
        "Por favor, lembre-se de levar o guarda-chuva, porque a "
        "previsão diz que vai chover a noite toda.",
    ],
}
